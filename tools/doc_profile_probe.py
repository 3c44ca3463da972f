"""Member-level cold probe for doc_profile (round 13, VERDICT r12 §Next 7).

One cold JVM; each of the 7 members timed serially with the noop sink,
then the concurrent suite itself — so the gap between max(member) and
suite wall-clock (the thread fan-out's effectiveness) is measurable.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from uw_hadoop_aglorithms_spark.operators import dedup, suites, textstats  # noqa: E402
from uw_hadoop_aglorithms_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

spark = get_spark("doc-profile-probe")
spark.sparkContext.setLogLevel("ERROR")
spark.read.parquet(f"{SF_DIR}/nation.parquet").count()

timings = {}
members = (
    ("doc_stats", textstats.doc_stats),
    ("quality", textstats.quality_score),
    ("repetition", textstats.repetition_score),
    ("lang_id", textstats.lang_id),
    ("lm", textstats.lm_score),
    ("span", dedup.span_dedup),
    ("gopher", textstats.gopher_rules),
)
for rep in range(2):
    for name, fn in members:
        spark.sparkContext.setJobDescription(f"probe:{name}")
        t0 = time.perf_counter()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        timings.setdefault(name, []).append(
            round(time.perf_counter() - t0, 3)
        )
    t0 = time.perf_counter()
    spark.sparkContext.setJobDescription("probe:suite")
    suites.doc_profile(spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()
    timings.setdefault("suite", []).append(round(time.perf_counter() - t0, 3))
print(json.dumps(timings))
spark.stop()
