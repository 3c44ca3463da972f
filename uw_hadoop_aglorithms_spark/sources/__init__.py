"""Sources & sinks: the catalog of named-schema tables (SURVEY.md §2.1).

The reference reads line-oriented text with positional fields (e.g. reference
Spark/SparkSQL/Q1.scala:37-38 splits on '|' and indexes field 10 for
l_shipdate). Here every table is a named-schema Parquet scan, so Catalyst
gets column pruning and predicate pushdown for free.
"""
