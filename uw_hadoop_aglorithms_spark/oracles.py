"""DuckDB oracle SQL for every SQL-expressible query (SURVEY.md §5.1).

Each string is ANSI SQL runnable by DuckDB against the same parquet tables
the Spark queries read (views: region nation customer supplier part orders
lineitem events documents embeddings). Column aliases match the Spark
queries EXACTLY — the driver's comparison sorts columns by name and hashes
values, so name drift == failure.

Float discipline: every float aggregate is rounded to the same fixed scale
in both engines (see operators/relational.py _MONEY_SCALE) because double
summation order differs between Spark and DuckDB.
"""

from __future__ import annotations

from uw_hadoop_aglorithms_spark.operators.relational import Q5_NATIONS, Q7_DATE, SHIP_DATE

RELATIONAL_ORACLES: dict[str, str] = {
    "q1": f"""
        SELECT count(*) AS count_items
        FROM lineitem
        WHERE l_shipdate = TIMESTAMP '{SHIP_DATE}'
    """,
    "q2": f"""
        SELECT o_orderpriority, o_orderkey
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate = TIMESTAMP '{SHIP_DATE}'
        ORDER BY o_orderkey
        LIMIT 20
    """,
    "q3": f"""
        SELECT l_orderkey, p_name, s_name
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        WHERE l_shipdate = TIMESTAMP '{SHIP_DATE}'
        ORDER BY l_orderkey, p_name, s_name
        LIMIT 20
    """,
    "q4": f"""
        SELECT n_nationkey, n_name, count(*) AS count_items
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_shipdate = TIMESTAMP '{SHIP_DATE}'
        GROUP BY n_nationkey, n_name
        ORDER BY n_nationkey
    """,
    "q5": f"""
        SELECT n_name, strftime(l_shipdate, '%Y-%m') AS ship_month,
               count(*) AS count_items
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE n_name IN ('{Q5_NATIONS[0]}', '{Q5_NATIONS[1]}')
        GROUP BY n_name, ship_month
        ORDER BY n_name, ship_month
    """,
    "q6": f"""
        SELECT
            l_returnflag,
            l_linestatus,
            round(sum(l_quantity), 2) AS sum_qty,
            round(sum(l_extendedprice), 2) AS sum_base_price,
            round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
            round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
            round(avg(l_quantity), 6) AS avg_qty,
            round(avg(l_extendedprice), 6) AS avg_price,
            round(avg(l_discount), 6) AS avg_disc,
            count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate = TIMESTAMP '{SHIP_DATE}'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "q7": f"""
        WITH per_order AS (
            SELECT l_orderkey, o_custkey, o_orderdate, o_orderpriority,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE o_orderdate < TIMESTAMP '{Q7_DATE}'
              AND l_shipdate > TIMESTAMP '{Q7_DATE}'
            GROUP BY l_orderkey, o_custkey, o_orderdate, o_orderpriority
        )
        SELECT c_name, l_orderkey, revenue, o_orderdate, o_orderpriority
        FROM per_order JOIN customer ON o_custkey = c_custkey
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """,
    "semi_join": f"""
        SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM orders
        WHERE o_orderkey IN (
            SELECT l_orderkey FROM lineitem
            WHERE l_shipdate > TIMESTAMP '{Q7_DATE}'
        )
        ORDER BY o_orderkey
    """,
    "anti_join": f"""
        SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM orders
        WHERE o_orderkey NOT IN (
            SELECT l_orderkey FROM lineitem
            WHERE l_shipdate > TIMESTAMP '{Q7_DATE}'
        )
        ORDER BY o_orderkey
    """,
    "rollup_revenue": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
        ORDER BY l_returnflag, l_linestatus
    """,
    "set_ops": """
        SELECT 'intersect' AS op, c_custkey FROM (
            SELECT DISTINCT o_custkey AS c_custkey FROM orders
            INTERSECT
            SELECT c_custkey FROM customer WHERE c_acctbal > 0
        )
        UNION ALL
        SELECT 'except' AS op, c_custkey FROM (
            SELECT c_custkey FROM customer WHERE c_acctbal > 0
            EXCEPT
            SELECT DISTINCT o_custkey AS c_custkey FROM orders
        )
        ORDER BY op, c_custkey
    """,
}


def all_oracles() -> dict[str, str]:
    """Merged oracle map across operator families (driver contract)."""
    merged: dict[str, str] = {}
    merged.update(RELATIONAL_ORACLES)
    return merged
