"""uw_hadoop_aglorithms_spark — a PySpark-native analytics engine.

A brand-new, idiomatic PySpark (DataFrame / Spark SQL / Structured
Streaming) engine with the query and data-processing capabilities of the
reference repo `muneebazam/uw-hadoop-aglorithms` (a UW Hadoop/Spark course
repo: MapReduce text analytics, TPC-H-style RDD queries, personalized
PageRank, an SGD spam classifier, and DStream streaming jobs).

Design stance (see SURVEY.md):
- declare logical plans with the DataFrame API and let Catalyst + AQE pick
  physical strategies (the reference hand-built every physical plan);
- named schemas everywhere (the reference addressed columns by ordinal);
- shuffles minimized by construction: broadcast dims, partial aggregation,
  window functions instead of secondary-sort tricks;
- Python UDFs only where semantics genuinely require them (serial SGD fold,
  iterative PageRank driver); everything else stays JVM-side.
"""

__version__ = "0.1.0"

from uw_hadoop_aglorithms_spark.session import get_spark  # noqa: F401
from uw_hadoop_aglorithms_spark.sources.catalog import Catalog, load_tables  # noqa: F401
