"""Content-sketch engine (SURVEY §2.4 A3-A8, §3.3).

Re-expresses the reference's per-record sketch fold
(``findopendata/table_sketch.py:37-52`` → ``column_sketch.py:166-197``)
as a partial+final Spark dataflow: JVM-side normalization and hashing,
then two vectorized ``applyInPandas`` stages (per-salt partials,
elementwise merge) — the UDAF shape that scales to the reference's 1M
records/dataset cap across any number of executors.
"""

from findopendata_spark.sketch.column_sketch import sketch_columns  # noqa: F401
from findopendata_spark.sketch.minhash import (  # noqa: F401
    MinHashPermutations,
    minhash_partial,
)
