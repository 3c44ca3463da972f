"""Skew mitigation: salted join (SURVEY.md §4 scale toolbox).

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime; this explicit salted join is the belt-and-braces tool for the
pathological case AQE can't fix — a single join key hot enough that one
task would receive a large fraction of the shuffle (e.g. a dedup bucket
holding near-identical boilerplate documents at 100 TB).

Mechanics: the big side gets a deterministic salt in [0, n); the small
side is replicated n ways; the join key becomes (key, salt). One hot key
spreads over n tasks at the cost of replicating the small side n×.
Results are exactly a plain inner join (equivalence is tested).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALTS = 8


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = DEFAULT_SALTS,
    how: str = "inner",
) -> DataFrame:
    """Inner/left join `big ⋈ small` on column `on`, with the big side's
    rows spread over `n_salts` sub-keys.

    The salt is a hash of the big side's whole row (xxhash64 of all
    columns) — deterministic, no rand(), so retries/speculative tasks
    agree. Replicating `small` multiplies its size by n_salts: keep the
    small side genuinely small (dimension-table scale).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts))
    big_s = big.withColumn("__salt", salt)
    salts = F.explode(F.array(*[F.lit(i).cast("bigint") for i in range(n_salts)]))
    small_s = small.withColumn("__salt", salts)
    out = big_s.join(small_s, [on, "__salt"], how)
    return out.drop("__salt")


def plan_summary(df: DataFrame, execute: bool = False) -> dict[str, object]:
    """Inspect the executed plan for the scale-critical properties:
    scans + pushed filters, join strategies, shuffle count. The
    programmatic form of `.explain("formatted")` checks, used by plan
    tests and tuning sessions.

    With ``execute=True`` the frame is materialized first so AQE's FINAL
    plan (runtime join conversions, coalesced partitions, codegen spans)
    is inspected instead of the pre-execution guess."""
    if execute:
        # materialize THIS DataFrame's queryExecution (count() would build
        # and finalize a different plan); summary targets are small-result
        # queries, so collect is bounded
        df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    pushed = []
    for seg in plan.split("PushedFilters: [")[1:]:
        inner = seg.split("]")[0].strip()
        if inner:
            pushed.append(inner)
    return {
        "file_scans": plan.count("FileScan"),
        "pushed_filters": pushed,
        "broadcast_hash_joins": plan.count("BroadcastHashJoin"),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "shuffles": plan.count("Exchange hashpartitioning")
        + plan.count("Exchange rangepartitioning"),
        # AQE prints codegen stages as "*(n)" prefixes in the string plan
        "wholestage_codegen_spans": plan.count("WholeStageCodegen") + plan.count("*("),
    }
