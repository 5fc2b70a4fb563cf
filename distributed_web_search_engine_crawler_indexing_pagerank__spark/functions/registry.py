"""SQL registration surface: scalar UDFs, a grouped-agg UDAF, and
Python UDTFs callable from ``spark.sql``.

SURVEY §2.1 closes with the reference's only extension mechanism: every
lambda is a serialized Java closure shipped over HTTP
(src/tools/Serializer.java:8-46) — there is no named-function registry a
query author can call. Spark's registry IS that surface done right:
``spark.udf.register`` / ``spark.udtf.register`` make the same logic
addressable by name from SQL text, so ad-hoc queries compose with the
engine's curated functions instead of re-serializing code.

Scale notes:

- The scalar entries re-register the existing Arrow ``pandas_udf``
  columns (functions/udfs.py) — registration changes addressability, not
  the execution path (still Arrow-batched, still off the hot path where
  ``functions/exprs.py`` has a JVM-codegen equivalent).
- The UDAF is a grouped-agg ``pandas_udf``: one Arrow batch per group,
  usable in SQL ``GROUP BY``. Floating-point reduction order inside a
  group follows the batch, so treat results as tolerance-equal, not
  hash-equal (which is why it has pytest coverage, not a DuckDB oracle).
- UDTFs are the SQL face of flatMap (SURVEY §2.1 #3): one input row →
  many output rows via ``LATERAL``. Prefer ``explode(split(...))`` where
  expressible — the UDTF exists for logic that genuinely needs Python.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql.functions import pandas_udf, udtf
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

__all__ = ["register_sql_functions", "geo_mean_udaf"]


# type OBJECTS, not DDL strings: string types would be parsed against the
# active session at import time, and this module imports session-free
@pandas_udf(DoubleType())
def geo_mean_udaf(v: pd.Series) -> float:
    """Geometric mean of positive values (grouped-agg UDAF): the rank
    fusion every search scorer wants and no built-in provides."""
    vals = v.dropna()
    vals = vals[vals > 0]
    if len(vals) == 0:
        return float("nan")
    import numpy as np

    return float(math.exp(np.log(vals.to_numpy(dtype="float64")).mean()))


class _UrlParts:
    """One URL → one row of (scheme, host, path) — pure-Python parse
    matching javaport.urlnorm's component split."""

    def eval(self, url: str):  # noqa: D102 — UDTF contract method
        if url is None:
            return
        scheme, sep, rest = url.partition("://")
        if not sep:
            scheme, rest = "", url
        hostport, slash, path = rest.partition("/")
        yield scheme or None, hostport or None, (slash + path) if slash else "/"


class _SplitTerms:
    """One text → one row per lowercase whitespace token with its
    position: flatMap as a SQL table function."""

    def eval(self, text: str):  # noqa: D102 — UDTF contract method
        if text is None:
            return
        for i, tok in enumerate(text.lower().split()):
            yield i, tok


url_parts_udtf = udtf(
    _UrlParts,
    returnType=StructType(
        [
            StructField("scheme", StringType()),
            StructField("host", StringType()),
            StructField("path", StringType()),
        ]
    ),
)
split_terms_udtf = udtf(
    _SplitTerms,
    returnType=StructType(
        [
            StructField("pos", IntegerType()),
            StructField("token", StringType()),
        ]
    ),
)


def register_sql_functions(spark) -> None:
    """Make the engine's function surface addressable from SQL text.

    Registers: ``ref_hash``, ``host_key``, ``url_path``,
    ``normalize_seed`` (Arrow scalar UDFs over javaport); ``geo_mean``
    (grouped-agg UDAF); ``url_parts``, ``split_terms`` (UDTFs, use via
    ``LATERAL``). Idempotent — re-registering replaces.
    """
    from .udfs import (
        host_key_udf,
        normalize_seed_udf,
        ref_hash_udf,
        url_path_udf,
    )

    spark.udf.register("ref_hash", ref_hash_udf)
    spark.udf.register("host_key", host_key_udf)
    spark.udf.register("url_path", url_path_udf)
    spark.udf.register("normalize_seed", normalize_seed_udf)
    spark.udf.register("geo_mean", geo_mean_udaf)
    spark.udtf.register("url_parts", url_parts_udtf)
    spark.udtf.register("split_terms", split_terms_udtf)
