"""TPC-H family, widened: Q1, Q4, Q7, Q8, Q13, Q14, Q19, Q22 over the
driver's TPC-H-ish schema (Q3/Q5/Q6/Q10/Q18 live in
queries_relational_ext.py).

The reference has no relational operators (SURVEY.md §0) — this family
exists because §2.E mandates the full SQL-analytics surface and TPC-H
is the canonical public benchmark of it.  Where the driver's schema
omits a column the spec query needs (l_shipmode, l_commitdate,
o_comment, c_phone, p_container, partsupp), the query is adapted to
the closest shape the schema supports and documented as such; the
relational *operator* under test (EXISTS decorrelation, double
aggregation, disjunctive pushdown, anti-join + scalar subquery) is
unchanged.

Determinism convention for cross-engine hash parity: every double
aggregate goes through DECIMAL(18,6) (see functions/deterministic.py);
averages are spelled exact-decimal-sum ÷ count so both engines perform
one identical double division.

Scale notes (100 TB): all eight queries keep dims broadcast-able
(nation/region/part at TPC-H scale factors stay ≪ the 10 MB-1 GB
broadcast budget; Spark's AQE converts the joins at runtime), aggregate
partial/final with map-side combine, and push every date/brand/size
predicate into the parquet scan.  The only full-fact shuffles are the
orderkey/custkey spine joins — exactly the ones bucketing
(q_bucketed_join) removes when the layout is owned.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tmp_parquet_merge_spark.functions.deterministic import dsum, dsum_expr
from tmp_parquet_merge_spark.registry import query, t


def _views(spark, sf_dir, *names):
    for n in names:
        t(spark, sf_dir, n).createOrReplaceTempView(n)


# ---------------------------------------------------------------------------
# Q1 — pricing summary report (the canonical wide aggregate)
# ---------------------------------------------------------------------------


@query(
    "q_sql_tpch_q1",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
                   AS sum_base_price,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                             AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                             AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
                   / COUNT(*) AS avg_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
                   / COUNT(*) AS avg_price,
               CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE)
                   / COUNT(*) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2001-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
)
def q_sql_tpch_q1(spark, sf_dir):
    """TPC-H Q1 (pricing summary): eight aggregates over two grouping
    keys — the whole-stage-codegen showcase.  One scan (only the 7
    needed columns in ReadSchema, shipdate pushed), one partial/final
    hash-agg pair; the shuffle carries ≤ |flags|×|status| rows per
    task regardless of input size.  Averages are spelled
    decimal-sum ÷ count so Spark and DuckDB round identically."""
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= "2001-09-02"
    )
    cnt = F.count(F.lit(1))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum_expr(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("sum_disc_price"),
            dsum_expr(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax"))
            ).alias("sum_charge"),
            (dsum("l_quantity") / cnt).alias("avg_qty"),
            (dsum("l_extendedprice") / cnt).alias("avg_price"),
            (dsum("l_discount") / cnt).alias("avg_disc"),
            cnt.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# Q4 — order priority checking (EXISTS decorrelation)
# ---------------------------------------------------------------------------

# Adapted: the driver schema has no l_commitdate/l_receiptdate, so
# "late" is spelled l_shipdate > o_orderdate + 60 days (shipped more
# than 60 days after ordering) — same correlated-EXISTS shape.
_TPCH_Q4 = """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1996-04-01'
      AND EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey
            AND l_shipdate > o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
"""


@query("q_sql_tpch_q4", oracle=_TPCH_Q4)
def q_sql_tpch_q4(spark, sf_dir):
    """TPC-H Q4 (order priority checking), adapted to the driver
    schema (late = shipped >60 days after order date; no commit/receipt
    dates exist).  The operator under test is correlated-EXISTS
    decorrelation: Catalyst rewrites the subquery to a LEFT SEMI join
    on l_orderkey, so the fact table is scanned once and the semi join
    short-circuits per key.  Shared SQL text on both engines."""
    _views(spark, sf_dir, "orders", "lineitem")
    return spark.sql(_TPCH_Q4)


# ---------------------------------------------------------------------------
# Q7 — volume shipping between two nations
# ---------------------------------------------------------------------------

_TPCH_Q7 = """
    SELECT supp_nation, cust_nation, l_year,
           CAST(SUM(CAST(volume AS DECIMAL(18,6))) AS DOUBLE) AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation,
               n2.n_name AS cust_nation,
               CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS l_year,
               l_extendedprice * (1 - l_discount) AS volume
        FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
           OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    ) AS shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
"""


@query("q_sql_tpch_q7", oracle=_TPCH_Q7)
def q_sql_tpch_q7(spark, sf_dir):
    """TPC-H Q7 (volume shipping): the two-role dimension join —
    nation joins the spine twice under different aliases, with a
    disjunctive cross-alias predicate.  Both nation joins broadcast;
    the nation-name filters reach the *joins* (not the scans), so
    Catalyst prunes the fact early via the semi-join-reduction AQE
    applies after the first broadcast.  Shared SQL on both engines."""
    _views(
        spark, sf_dir,
        "supplier", "lineitem", "orders", "customer", "nation",
    )
    return spark.sql(_TPCH_Q7)


# ---------------------------------------------------------------------------
# Q8 — national market share
# ---------------------------------------------------------------------------

_TPCH_Q8 = """
    SELECT o_year,
           CAST(SUM(CAST(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END
                         AS DECIMAL(18,6))) AS DOUBLE)
           / CAST(SUM(CAST(volume AS DECIMAL(18,6))) AS DOUBLE)
               AS mkt_share
    FROM (
        SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
               l_extendedprice * (1 - l_discount) AS volume,
               n2.n_name AS nation
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region   ON n1.n_regionkey = r_regionkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1998-01-01'
          AND p_type = 'ECONOMY'
    ) AS all_nations
    GROUP BY o_year
    ORDER BY o_year
"""


@query("q_sql_tpch_q8", oracle=_TPCH_Q8)
def q_sql_tpch_q8(spark, sf_dir):
    """TPC-H Q8 (national market share): 8-table join with a
    conditional-aggregate ratio.  Market share = decimal-exact
    conditional sum ÷ decimal-exact total, one double division at the
    end (deterministic in both engines).  part/supplier/nation×2/region
    all broadcast; only the lineitem⋈orders⋈customer spine shuffles.
    p_type equality ('ECONOMY' — the driver's p_type is a 6-value
    enum, standing in for the spec's 150-type LIKE) is pushed to the
    part scan before the broadcast is built."""
    _views(
        spark, sf_dir,
        "part", "lineitem", "supplier", "orders", "customer",
        "nation", "region",
    )
    return spark.sql(_TPCH_Q8)


# ---------------------------------------------------------------------------
# Q13 — customer order-count distribution
# ---------------------------------------------------------------------------

# Adapted: the driver schema has no o_comment, so the spec's NOT LIKE
# comment filter is dropped; the operator (outer join preserving
# zero-order customers + double aggregation) is unchanged.
_TPCH_Q13 = """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey
    ) AS c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
"""


@query("q_sql_tpch_q13", oracle=_TPCH_Q13)
def q_sql_tpch_q13(spark, sf_dir):
    """TPC-H Q13 (customer distribution): double aggregation over a
    left outer join — COUNT(o_orderkey) counts non-NULL only, so
    order-less customers land in the c_count=0 bucket instead of
    disappearing (the semantics an inner join would silently break).
    First agg shuffles on c_custkey (same key as the join — AQE reuses
    the exchange); second agg's input is one row per customer, tiny."""
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(_TPCH_Q13)


# ---------------------------------------------------------------------------
# Q14 — promotion effect
# ---------------------------------------------------------------------------


@query(
    "q_sql_tpch_q14",
    oracle="""
        SELECT CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0 END AS DECIMAL(18,6))) AS DOUBLE)
               * 100.0
               / CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                               AS DECIMAL(18,6))) AS DOUBLE)
                   AS promo_revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-03-01'
          AND l_shipdate <  TIMESTAMP '1996-04-01'
    """,
)
def q_sql_tpch_q14(spark, sf_dir):
    """TPC-H Q14 (promotion effect): scalar ratio of a conditional
    aggregate over a fact⋈dim join.  The one-month shipdate range is
    pushed to the lineitem scan; part broadcasts; the CASE rides the
    join output inside one codegen stage, so the whole query is scan →
    broadcast-hash-join → partial agg → single final row."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-03-01")
        & (F.col("l_shipdate") < "1996-04-01")
    )
    p = t(spark, sf_dir, "part")
    joined = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return joined.agg(
        (
            dsum_expr(F.when(F.col("p_type") == "PROMO", disc).otherwise(0.0))
            * 100.0
            / dsum_expr(disc)
        ).alias("promo_revenue")
    )


# ---------------------------------------------------------------------------
# Q19 — discounted revenue (disjunctive multi-attribute predicates)
# ---------------------------------------------------------------------------

# Adapted: no p_container/l_shipmode in the driver schema; the three
# disjunct arms pair brand × size-range × quantity-range instead.  The
# operator under test — a join whose residual condition is a
# disjunction over both sides' attributes — is unchanged.
@query(
    "q_sql_tpch_q19",
    oracle="""
        SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                             AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
               AND l_quantity >= 1 AND l_quantity <= 21)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
               AND l_quantity >= 10 AND l_quantity <= 30)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 50
               AND l_quantity >= 20 AND l_quantity <= 40)
    """,
)
def q_sql_tpch_q19(spark, sf_dir):
    """TPC-H Q19 (discounted revenue): the disjunctive-predicate join.
    Catalyst extracts the single-side conjuncts it can — the OR of
    brand/size arms is pushable to the part scan as
    (brand=1 ∧ size≤15) ∨ (brand=2 ∧ size≤25) ∨ ... and the quantity
    bounds (1..40 envelope) to lineitem — then evaluates the full
    disjunction as the join residual.  part broadcasts, so the
    residual runs map-side with zero extra shuffle."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    arm = lambda brand, smax, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & (F.col("p_size").between(1, smax))
        & (F.col("l_quantity") >= qlo)
        & (F.col("l_quantity") <= qhi)
    )
    return j.filter(
        arm("Brand#1", 15, 1, 21)
        | arm("Brand#2", 25, 10, 30)
        | arm("Brand#3", 50, 20, 40)
    ).agg(
        dsum_expr(
            F.col("l_extendedprice") * (1 - F.col("l_discount"))
        ).alias("revenue")
    )


# ---------------------------------------------------------------------------
# Q22 — global sales opportunity (anti join + scalar subquery)
# ---------------------------------------------------------------------------

# Adapted: no c_phone in the driver schema, so the spec's country-code
# substring becomes c_mktsegment, and — because every synthetic
# customer has at least one order — "never ordered" becomes "no order
# since 1999" so the anti join keeps a non-trivial survivor set.  The
# operators under test — scalar subquery threshold + NOT EXISTS anti
# join — are unchanged.  The threshold is spelled exact-decimal-sum ÷
# count so the comparison is bit-identical in both engines (a naive
# AVG(double) could flip borderline rows).
_TPCH_Q22 = """
    SELECT c_mktsegment AS segment,
           COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
               AS totacctbal
    FROM customer
    WHERE c_acctbal > (
            SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
                   / COUNT(*)
            FROM customer WHERE c_acctbal > 0.0
          )
      AND NOT EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey
              AND o_orderdate >= TIMESTAMP '1999-01-01'
          )
    GROUP BY c_mktsegment
    ORDER BY segment
"""


@query("q_sql_tpch_q22", oracle=_TPCH_Q22)
def q_sql_tpch_q22(spark, sf_dir):
    """TPC-H Q22 (global sales opportunity): rich customers who never
    ordered.  Composes an uncorrelated scalar subquery (broadcast as a
    literal once evaluated — one extra tiny job, no per-row cost) with
    a NOT EXISTS Catalyst plans as LEFT ANTI join on o_custkey.  At
    100 TB the anti join shuffles customer×orders on custkey — the
    same spine bucketing removes; everything else is single-pass."""
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(_TPCH_Q22)
