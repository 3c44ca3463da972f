"""Scalar/array function library shared across operators (SURVEY.md §2.11).

The reference has no UDF framework — every operator IS user code. Here the
recurring shapes are centralized as JVM-side column expressions: tokenize,
bigram generation, vector math. Python UDFs appear only where Spark builtins
genuinely cannot express the semantics.
"""
