"""Scalar / vectorized functions (SURVEY.md §2.7, §2.9).

Everything here is a pure Spark column expression where possible (JVM-side,
whole-stage-codegen friendly); pandas UDFs only where semantics genuinely
need Python (canonical JSON, model-backed enrichment).
"""

from findopendata_spark.functions.urls import canonicalize_url, url_host  # noqa: F401
from findopendata_spark.functions.text import (  # noqa: F401
    normalize_value,
    strip_html,
    sanitize_filename,
    coalesce_timestamps,
    is_numeric_str,
)
