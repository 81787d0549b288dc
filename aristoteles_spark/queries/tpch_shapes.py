"""Remaining TPC-H query shapes, adapted to the driver test schema.

The driver tables (TESTDATA.md) have no partsupp table and no
l_shipmode/l_commitdate/c_phone columns, so the classic shapes that need
them (Q2/Q11/Q16/Q20/Q22) are re-expressed over lineitem/part/supplier/
customer while keeping the *plan shape* that matters at 100 TB:

- Q2  -> correlated MIN subquery, decorrelated to an aggregate join whose
         per-key side is broadcastable;
- Q4  -> EXISTS decorrelated to a left-semi hash join (no fact dedup);
- Q6  -> pure scan: sargable filters + ungrouped partial-agg sum;
- Q10 -> aggregate-then-top-k-then-broadcast-back ranking join;
- Q12 -> fact-fact join + CASE-conditional grouped counts;
- Q7  -> double-dimension (supplier-nation x customer-nation) volume grid;
- Q8  -> conditional-aggregate market share (one scan, no self-join);
- Q9  -> LIKE-filtered multi-join profit rollup;
- Q11 -> HAVING against a global scalar aggregate (two-pass, tiny 2nd pass);
- Q14 -> conditional / total aggregate ratio in a single pass;
- Q15 -> aggregate-equals-max scalar subquery over a derived view;
- Q16 -> COUNT(DISTINCT) with a NOT-IN blacklist as a left-anti join;
- Q19 -> disjunctive pushdown predicates (OR of conjunctions);
- Q20 -> nested aggregate subquery driving a semi-join chain;
- Q22 -> anti-join + deterministic scalar-average threshold.

With relational.py's j-series (Q3/Q5/Q13/Q17/Q18/Q21) and the Q1-shape
pricing summary, all 22 TPC-H query shapes are covered.

Determinism: sums go through DECIMAL casts; averages/ratios are computed
as CAST(decimal_sum AS DOUBLE) / count (single double division) on BOTH
sides; every computed column carries the same alias in Spark and SQL.

Reference scope note (SURVEY.md §2.3): the reference performs no joins at
all — these queries are engine-completeness breadth beyond reference
parity, same category as relational.py's j-series.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aristoteles_spark.sources.parquet_source import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _dec(c, prec="decimal(28,4)"):
    return c.cast(prec)


# --- TPC-H Q2 shape: per-part minimum price, suppliers achieving it.
# The per-part MIN aggregate is computed once over only the parts that
# survive the dimension filter (semi-reduced before the agg), then joined
# back. Both the filtered part set and the per-part minima are tiny next
# to lineitem -> broadcast; lineitem itself never shuffles.
def q_min_cost_supplier(spark, sf_dir):
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    s = _t(spark, sf_dir, "supplier")
    rel = li.join(F.broadcast(p.select("p_partkey", "p_name")), li.l_partkey == F.col("p_partkey"))
    minp = rel.groupBy("p_partkey").agg(F.min("l_extendedprice").alias("min_price"))
    return (
        rel.join(F.broadcast(minp.withColumnRenamed("p_partkey", "mp_partkey")),
                 (F.col("p_partkey") == F.col("mp_partkey"))
                 & (F.col("l_extendedprice") == F.col("min_price")))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select("p_partkey", "p_name", "s_name", "min_price")
        .distinct()
        .orderBy("p_partkey", "s_name")
    )


# --- TPC-H Q4 shape: EXISTS -> left-semi join; the semi join never
# materializes or dedups the probe side, and the grouped count that
# follows reuses partial aggregation.
def q_priority_exists(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-04-01"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# --- TPC-H Q7 shape: volume between two nations by year. nation is
# broadcast twice under different roles (supplier side / customer side);
# the fact chain shuffles only on its join keys.
def q_nation_volume(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(
            F.sum(_dec(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "revenue"
            )
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# --- TPC-H Q8 shape: market share = conditional sum / total sum per year,
# one scan of the joined fact chain, no self-join. Ratio is a single
# double division over exact decimal sums.
def q_market_share(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("c_regionkey")
    )
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    vol = _dec(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    target = F.when(F.col("supp_nation") == "NATION_5", vol).otherwise(
        _dec(F.lit(0))
    )
    grouped = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(r), F.col("c_regionkey") == r.r_regionkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(target).alias("nation_volume"),
            F.sum(vol).alias("total_volume"),
        )
    )
    return grouped.select(
        "o_year",
        "nation_volume",
        "total_volume",
        (
            F.col("nation_volume").cast("double")
            / F.col("total_volume").cast("double")
        ).alias("mkt_share"),
    ).orderBy("o_year")


# --- TPC-H Q9 shape: LIKE-filtered part dimension, profit rolled up by
# supplier nation and year. The LIKE filter prunes part before broadcast;
# profit is an exact decimal sum of a per-row expression.
def q_profit(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    profit = _dec(
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * F.col("l_quantity") * 0.1
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(F.sum(profit).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


# --- TPC-H Q11 shape: per-key value vs a fraction of the global total.
# Pass 1 aggregates per part (map-side partial agg); pass 2 is a scalar
# over the pass-1 result (tiny), broadcast back as a literal-like 1-row
# frame. No second scan of lineitem.
def q_important_parts(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    # multiply exact decimals, not doubles: price*qty reaches ~5e6, where a
    # double product cast to DECIMAL(28,4) rounds differently per engine
    # (the 10^10-scaled value exceeds 2^53)
    value = _dec(
        F.col("l_extendedprice").cast("decimal(18,2)")
        * F.col("l_quantity").cast("decimal(18,2)")
    )
    per_part = li.groupBy(F.col("l_partkey").alias("partkey")).agg(
        F.sum(value).alias("part_value")
    )
    total = per_part.agg(F.sum("part_value").alias("total_value"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(
            F.col("part_value").cast("double")
            > F.col("total_value").cast("double") * 0.0006
        )
        .select("partkey", "part_value")
        .orderBy(F.desc("part_value"), "partkey")
    )


# --- TPC-H Q14 shape: promo revenue ratio — conditional and total sums in
# the same aggregate, so one scan and one (partial-agg'd) reduction.
def q_promo_revenue(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01"))
        & (F.col("l_shipdate") < F.lit("1997-10-01"))
    )
    p = _t(spark, sf_dir, "part")
    vol = _dec(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    promo = F.when(F.col("p_type") == "PROMO", vol).otherwise(_dec(F.lit(0)))
    agg = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(F.sum(promo).alias("promo_sum"), F.sum(vol).alias("total_sum"))
    )
    return agg.select(
        (
            F.lit(100.0)
            * F.col("promo_sum").cast("double")
            / F.col("total_sum").cast("double")
        ).alias("promo_revenue")
    )


# --- TPC-H Q15 shape: suppliers whose quarter revenue equals the maximum.
# The revenue view is computed once; the max is a scalar over it; the
# equality join back is exact because both sides are the same decimals.
def q_top_supplier(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-04-01"))
    )
    s = _t(spark, sf_dir, "supplier")
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_dec(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
            "total_revenue"
        )
    )
    maxrev = rev.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        rev.crossJoin(F.broadcast(maxrev))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# --- TPC-H Q16 shape: COUNT(DISTINCT supplier) per part attribute group,
# with a NOT-IN supplier blacklist as a left-anti join (null-safe here:
# the blacklist key is non-null by construction).
def q_supplier_cnt(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    )
    bad = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(bad), li.l_suppkey == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_size")
    )


# --- TPC-H Q19 shape: OR of conjunctive clauses over the joined pair.
# Each disjunct is sargable; Catalyst pushes the part-side conjuncts into
# the broadcast build and the lineitem-side bounds into the parquet scan
# (the OR of ranges still prunes row groups on l_quantity min/max).
def q_disjunctive(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            F.sum(_dec(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "revenue"
            )
        )
    )


# --- TPC-H Q22 shape: positive-balance average as a deterministic scalar
# (decimal sum / count, one double division), anti-join against recent
# orders ("no order since 2000"), grouped count+sum per nation. The scalar
# and the nation filter broadcast; the anti join is the only shuffle.
def q_idle_customers(spark, sf_dir):
    nations = [0, 1, 2, 3, 4, 5, 6]
    c = _t(spark, sf_dir, "customer").filter(F.col("c_nationkey").isin(nations))
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01"))
        .select("o_custkey")
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_bal")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal").cast("double") > F.col("avg_bal"))
        .join(o, F.col("c_custkey") == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


# --- TPC-H Q6 shape: the pure scan query — filter + ungrouped aggregate,
# no join. Every predicate is sargable: l_shipdate/l_discount/l_quantity
# bounds reach the parquet scan as PushedFilters and prune row groups via
# column min/max stats; the aggregate is a map-side partial sum with a
# single-row final merge. At 100 TB this is the I/O-bound shape that
# measures raw scan throughput.
def q_forecast_revenue(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.sum(_dec(F.col("l_extendedprice") * F.col("l_discount"))).alias("revenue")
    )


# --- TPC-H Q10 shape: returned-item revenue ranking. Aggregate FIRST
# (revenue per custkey over the fact-fact join), take the top 20 via
# sort+limit (TakeOrdered — no global sort materialization), and only
# then join the 20 winners back to the customer/nation dimensions as a
# broadcast. The wide customer table is never shuffled.
def q_returned_items(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-07-01"))
        & (F.col("o_orderdate") < F.lit("1997-10-01"))
    ).select("o_orderkey", "o_custkey")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    rev = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_custkey")
        .agg(
            F.sum(_dec(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), "o_custkey")
        .limit(20)
    )
    return (
        c.join(F.broadcast(rev), c.c_custkey == rev.o_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
    )


# --- TPC-H Q12 shape: fact-fact join + grouped conditional counts.
# (The driver schema has no l_shipmode/l_commitdate; the group key is
# l_linestatus and "late" is shipped >90 days after order date — same
# plan: shuffle join on orderkey, CASE-conditional partial aggregation.)
# Only the 3 needed orders columns are scanned; the priority CASE folds
# into the aggregate so there is exactly one shuffle after the join.
def q_late_shipments(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    ).select("l_orderkey", "l_shipdate", "l_linestatus")
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


# --- TPC-H Q20 shape: nested aggregate subquery -> semi-join chain.
# (No partsupp table; "excess availability" becomes supplier dominance —
# a supplier shipping more than 2x its fair share of a filtered part's
# quantity, a scale-invariant rule so the result is non-trivial at every
# SF.) Per-pair quantities aggregate once on (partkey, suppkey); per-part
# totals re-aggregate the already-tiny pair rows; the dominant-supplier
# key set is small and drives a left-semi broadcast into supplier.
def q_dominant_suppliers(spark, sf_dir):
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%bolt%"))
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey", "l_quantity")
    s = _t(spark, sf_dir, "supplier").filter(F.col("s_nationkey").isin(0, 1, 2, 3))
    pairs = (
        li.join(F.broadcast(p.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty"))
    )
    tot = pairs.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        F.sum("qty").alias("total_qty"), F.count(F.lit(1)).alias("n_supp")
    )
    dominant = (
        pairs.join(F.broadcast(tot), pairs.l_partkey == tot.t_partkey)
        .filter(
            F.col("qty") * F.col("n_supp") > F.lit(2) * F.col("total_qty")
        )
        .select("l_suppkey")
    )
    return (
        s.join(F.broadcast(dominant), s.s_suppkey == dominant.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


QUERIES = {
    "h2_min_cost_supplier": q_min_cost_supplier,
    "h4_priority_exists": q_priority_exists,
    "h7_nation_volume": q_nation_volume,
    "h8_market_share": q_market_share,
    "h9_profit": q_profit,
    "h11_important_parts": q_important_parts,
    "h14_promo_revenue": q_promo_revenue,
    "h15_top_supplier": q_top_supplier,
    "h16_supplier_cnt": q_supplier_cnt,
    "h19_disjunctive": q_disjunctive,
    "h22_idle_customers": q_idle_customers,
    "h6_forecast_revenue": q_forecast_revenue,
    "h10_returned_items": q_returned_items,
    "h12_late_shipments": q_late_shipments,
    "h20_dominant_suppliers": q_dominant_suppliers,
}

ORACLE = {
    "h6_forecast_revenue": (
        "SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(28,4))) "
        "AS DOUBLE) AS revenue "
        "FROM lineitem "
        "WHERE l_shipdate >= '1997-01-01' AND l_shipdate < '1998-01-01' "
        "AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"
    ),
    "h10_returned_items": (
        "WITH rev AS ("
        "SELECT o_custkey, "
        "sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,4))) AS revenue "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "WHERE l_returnflag = 'R' "
        "AND o_orderdate >= '1997-07-01' AND o_orderdate < '1997-10-01' "
        "GROUP BY o_custkey ORDER BY revenue DESC, o_custkey LIMIT 20) "
        "SELECT c_custkey, c_name, CAST(revenue AS DOUBLE) AS revenue, "
        "c_acctbal, n_name "
        "FROM rev JOIN customer ON c_custkey = o_custkey "
        "JOIN nation ON c_nationkey = n_nationkey "
        "ORDER BY revenue DESC, c_custkey"
    ),
    "h12_late_shipments": (
        "SELECT l_linestatus, "
        "CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') "
        "  THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count, "
        "CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') "
        "  THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "WHERE l_shipdate >= '1997-01-01' AND l_shipdate < '1998-01-01' "
        "AND l_shipdate > o_orderdate + INTERVAL 90 DAY "
        "GROUP BY l_linestatus ORDER BY l_linestatus"
    ),
    "h20_dominant_suppliers": (
        "WITH pairs AS ("
        "SELECT l_partkey, l_suppkey, "
        "sum(CAST(l_quantity AS DECIMAL(18,2))) AS qty "
        "FROM lineitem JOIN part ON l_partkey = p_partkey "
        "WHERE p_name LIKE '%bolt%' GROUP BY l_partkey, l_suppkey), "
        "tot AS (SELECT l_partkey AS t_partkey, sum(qty) AS total_qty, "
        "count(*) AS n_supp FROM pairs GROUP BY l_partkey) "
        "SELECT s_suppkey, s_name FROM supplier "
        "WHERE s_nationkey IN (0, 1, 2, 3) AND s_suppkey IN ("
        "  SELECT l_suppkey FROM pairs JOIN tot ON l_partkey = t_partkey "
        "  WHERE qty * n_supp > 2 * total_qty) "
        "ORDER BY s_suppkey"
    ),
    "h2_min_cost_supplier": (
        "SELECT DISTINCT p_partkey, p_name, s_name, l_extendedprice AS min_price "
        "FROM part JOIN lineitem ON l_partkey = p_partkey "
        "JOIN supplier ON l_suppkey = s_suppkey "
        "WHERE p_size = 15 AND p_type = 'STANDARD' "
        "AND l_extendedprice = (SELECT min(l2.l_extendedprice) FROM lineitem l2 "
        "  WHERE l2.l_partkey = p_partkey) "
        "ORDER BY p_partkey, s_name"
    ),
    "h4_priority_exists": (
        "SELECT o_orderpriority, count(*) AS order_count FROM orders "
        "WHERE o_orderdate >= '1997-01-01' AND o_orderdate < '1997-04-01' "
        "AND EXISTS (SELECT 1 FROM lineitem "
        "  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R') "
        "GROUP BY o_orderpriority ORDER BY o_orderpriority"
    ),
    "h7_nation_volume": (
        "SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation, "
        "CAST(year(l_shipdate) AS INT) AS l_year, "
        "CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,4))) "
        "AS DOUBLE) AS revenue "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "JOIN customer ON o_custkey = c_custkey "
        "JOIN supplier ON l_suppkey = s_suppkey "
        "JOIN nation n1 ON s_nationkey = n1.n_nationkey "
        "JOIN nation n2 ON c_nationkey = n2.n_nationkey "
        "WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1998-01-01' "
        "AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2') "
        "  OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')) "
        "GROUP BY supp_nation, cust_nation, l_year "
        "ORDER BY supp_nation, cust_nation, l_year"
    ),
    "h8_market_share": (
        "WITH g AS ("
        "SELECT CAST(year(o_orderdate) AS INT) AS o_year, "
        "sum(CASE WHEN n2.n_name = 'NATION_5' "
        "  THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,4)) "
        "  ELSE CAST(0 AS DECIMAL(28,4)) END) AS nation_volume, "
        "sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,4))) AS total_volume "
        "FROM lineitem JOIN part ON l_partkey = p_partkey "
        "JOIN orders ON l_orderkey = o_orderkey "
        "JOIN customer ON o_custkey = c_custkey "
        "JOIN nation n1 ON c_nationkey = n1.n_nationkey "
        "JOIN region ON n1.n_regionkey = r_regionkey "
        "JOIN supplier ON l_suppkey = s_suppkey "
        "JOIN nation n2 ON s_nationkey = n2.n_nationkey "
        "WHERE p_type = 'ECONOMY' AND r_name = 'ASIA' "
        "AND o_orderdate >= '1996-01-01' AND o_orderdate < '1998-01-01' "
        "GROUP BY o_year) "
        "SELECT o_year, CAST(nation_volume AS DOUBLE) AS nation_volume, "
        "CAST(total_volume AS DOUBLE) AS total_volume, "
        "CAST(nation_volume AS DOUBLE) / CAST(total_volume AS DOUBLE) AS mkt_share "
        "FROM g ORDER BY o_year"
    ),
    "h9_profit": (
        "SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year, "
        "CAST(sum(CAST(l_extendedprice * (1 - l_discount) "
        "  - p_retailprice * l_quantity * 0.1 AS DECIMAL(28,4))) AS DOUBLE) "
        "AS sum_profit "
        "FROM lineitem JOIN part ON l_partkey = p_partkey "
        "JOIN orders ON l_orderkey = o_orderkey "
        "JOIN supplier ON l_suppkey = s_suppkey "
        "JOIN nation ON s_nationkey = n_nationkey "
        "WHERE p_name LIKE '%red%' "
        "GROUP BY n_name, o_year ORDER BY nation, o_year DESC"
    ),
    "h11_important_parts": (
        "WITH pv AS (SELECT l_partkey AS partkey, "
        "sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) "
        "  * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(28,4))) AS part_value "
        "FROM lineitem GROUP BY l_partkey) "
        "SELECT partkey, CAST(part_value AS DOUBLE) AS part_value FROM pv "
        "WHERE CAST(part_value AS DOUBLE) > "
        "(SELECT CAST(sum(part_value) AS DOUBLE) * 0.0006 FROM pv) "
        "ORDER BY part_value DESC, partkey"
    ),
    "h14_promo_revenue": (
        "SELECT 100.0 * CAST(sum(CASE WHEN p_type = 'PROMO' "
        "  THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,4)) "
        "  ELSE CAST(0 AS DECIMAL(28,4)) END) AS DOUBLE) "
        "/ CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,4))) "
        "  AS DOUBLE) AS promo_revenue "
        "FROM lineitem JOIN part ON l_partkey = p_partkey "
        "WHERE l_shipdate >= '1997-09-01' AND l_shipdate < '1997-10-01'"
    ),
    "h15_top_supplier": (
        "WITH revenue AS (SELECT l_suppkey AS supplier_no, "
        "sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,4))) AS total_revenue "
        "FROM lineitem WHERE l_shipdate >= '1997-01-01' AND l_shipdate < '1997-04-01' "
        "GROUP BY l_suppkey) "
        "SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue "
        "FROM supplier JOIN revenue ON s_suppkey = supplier_no "
        "WHERE total_revenue = (SELECT max(total_revenue) FROM revenue) "
        "ORDER BY s_suppkey"
    ),
    "h16_supplier_cnt": (
        "SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt "
        "FROM lineitem JOIN part ON l_partkey = p_partkey "
        "WHERE p_type <> 'PROMO' AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49) "
        "AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0) "
        "GROUP BY p_brand, p_size "
        "ORDER BY supplier_cnt DESC, p_brand, p_size"
    ),
    "h19_disjunctive": (
        "SELECT CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,4))) "
        "AS DOUBLE) AS revenue "
        "FROM lineitem JOIN part ON l_partkey = p_partkey "
        "WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5 "
        "       AND l_quantity BETWEEN 1 AND 11) "
        "   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 "
        "       AND l_quantity BETWEEN 10 AND 20) "
        "   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 "
        "       AND l_quantity BETWEEN 20 AND 30)"
    ),
    "h22_idle_customers": (
        "WITH cand AS (SELECT * FROM customer "
        "  WHERE c_nationkey IN (0, 1, 2, 3, 4, 5, 6)), "
        "avg_bal AS (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) "
        "  / count(*) AS avg_bal FROM cand WHERE c_acctbal > 0) "
        "SELECT c_nationkey, count(*) AS numcust, "
        "CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal "
        "FROM cand, avg_bal "
        "WHERE CAST(c_acctbal AS DOUBLE) > avg_bal "
        "AND NOT EXISTS (SELECT 1 FROM orders "
        "  WHERE o_custkey = c_custkey AND o_orderdate >= '2000-01-01') "
        "GROUP BY c_nationkey ORDER BY c_nationkey"
    ),
}
