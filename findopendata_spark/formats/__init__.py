"""File-format codecs implemented from the public specs (no external jars)."""
