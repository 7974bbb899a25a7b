"""Text / timestamp / numeric scalar functions (SURVEY.md §2.7).

All pure column expressions; the canonical-JSON normalizer for non-scalar
values is the one pandas-UDF exception (dict-key ordering is not
expressible with ``to_json``).
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType


def normalize_value(v: Column) -> Column:
    """String normalization applied before sketching.

    Reference: ``findopendata/column_sketch.py:171-174`` — every value is
    stringified then ``strip().lower()``-ed. For string columns this is the
    whole story; non-scalar values go through :func:`canonical_json_udf`.
    """
    return F.lower(F.trim(v.cast("string")))


@F.pandas_udf(StringType())
def canonical_json_udf(v: pd.Series) -> pd.Series:
    """``json.dumps(value, sort_keys=True)`` for non-scalar values.

    Reference: ``findopendata/column_sketch.py:171-173``. Spark's
    ``to_json`` keeps struct field order, the reference sorts keys — this
    Arrow-batched UDF pins the reference's ordering. Used only on the
    (rare) non-scalar columns; scalar columns never leave the JVM.
    """
    return v.map(
        lambda x: None
        if x is None
        else json.dumps(x, sort_keys=True, separators=(",", ":"), default=str)
    )


def strip_html(text: Column) -> Column:
    """Drop HTML tags, collapse whitespace.

    Reference: ``findopendata/metadata.py:50-54`` uses BeautifulSoup
    ``get_text()``; a tag-stripping regex is equivalent on the fixture
    corpus and keeps the expression JVM-side.
    """
    no_tags = F.regexp_replace(text, r"<[^>]*>", " ")
    return F.trim(F.regexp_replace(no_tags, r"\s+", " "))


def sanitize_filename(name: Column, default: str = "unnamed_file") -> Column:
    """Filesystem-safe filename, ≤255 chars keeping the extension.

    Reference: ``findopendata/util.py:9-22`` (spaces→``_``, strip unsafe
    chars, default name).
    """
    s = F.regexp_replace(F.trim(name), r"\s+", "_")
    s = F.regexp_replace(s, r"(?u)[^-\w.]", "")
    s = F.when(F.length(s) > 255, s.substr(F.lit(1), F.lit(255))).otherwise(s)
    return F.when((s.isNull()) | (s == ""), F.lit(default)).otherwise(s)


def coalesce_timestamps(*cols: Column) -> Column:
    """Timestamp fallback chain, UTC-normalized.

    Reference: ``findopendata/ckan/__init__.py:40-75`` — packages use
    ``modified → metadata_modified → metadata_created``; resources use
    ``created → revision_timestamp → last_modified``; naive stamps are
    assumed UTC (the session timezone is pinned to UTC in session.py).
    """
    return F.coalesce(*[F.to_timestamp(c) for c in cols])


def is_numeric_str(v: Column) -> Column:
    """True when the string parses as a float.

    Reference: ``findopendata/column_sketch.py:9-15`` (``float(x)``
    try/except). ``try_cast("double")`` accepts the same lexical space
    and returns NULL (not an ANSI error) on malformed input.
    """
    return v.try_cast("double").isNotNull()
