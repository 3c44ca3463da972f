"""Engine/library version block for every verification artifact.

VERDICT r7 §What's missing 3: the r6/r7 driver-vs-local hash divergence
could not be triaged post-hoc because no artifact recorded WHICH
pyspark/duckdb/JVM produced it. Every artifact writer (driver_sim,
bench, flake harness) embeds this block so the first question about any
future divergence — "same engine versions?" — starts from facts.
"""
from __future__ import annotations

import platform


def engine_versions(spark=None) -> dict:
    out: dict = {"python": platform.python_version(),
                 "platform": platform.platform()}
    try:
        import pyspark

        out["pyspark"] = pyspark.__version__
    except Exception:  # pragma: no cover — pyspark is always present
        out["pyspark"] = None
    try:
        import duckdb

        out["duckdb"] = duckdb.__version__
    except Exception:  # pragma: no cover
        out["duckdb"] = None
    if spark is not None:
        try:
            out["spark_jvm"] = spark.version
            out["java"] = (
                spark.sparkContext._jvm.java.lang.System.getProperty(
                    "java.version"
                )
            )
        except Exception:
            pass
    return out
