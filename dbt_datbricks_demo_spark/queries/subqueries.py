"""Round-4 subquery-decorrelation surface: TPC-H Q4/Q13/Q17/Q11/Q22/Q21
shapes.

The round-3 additions (Q5/Q10/Q18) stressed multi-join ordering; what
remained untested was the *subquery* surface every warehouse workload
leans on — correlated EXISTS / NOT EXISTS, scalar subqueries feeding a
filter or HAVING, and outer-join aggregate distributions. Each query
here is written in the DataFrame API in its already-decorrelated form
(semi/anti joins, one-row broadcast scalars, window or re-joined
aggregates) — the shape Catalyst's decorrelation rules produce and the
only shape that scales: a correlated subquery executed per-row is a
nested loop over 100 TB, while a semi-join on the correlation key is
one shuffle. The DuckDB oracles keep the *correlated* SQL spelling, so
the gate also proves the decorrelated plan computes exactly the
textbook subquery semantics.

Reference basis: the reference's join/test surface is all small-dim
equi-joins and anti-join tests (SURVEY §2.4, e.g.
/root/reference/models/marts/fct_device_summary.sql joins,
tests/generic relationship tests) — these queries extend that surface
to the standard decision-support subquery shapes at scale.

Determinism conventions follow queries/inventory.py: money sums
accumulate as DECIMAL then cast to double at the edge; averages are
exact_sum / count; comparisons against derived double thresholds use
identical IEEE operation order on both engines; top-k always carries a
unique tie-break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dbt_datbricks_demo_spark.queries.inventory import _register, _spread, _t


# ---------------------------------------------------------------------------
# TPC-H Q4 shape: correlated EXISTS → left-semi join
# ---------------------------------------------------------------------------
@_register(
    "late_shipment_priority",
    "TPC-H Q4 shape: orders (one quarter) with EXISTS a lineitem shipped "
    ">20 days after the order date, counted by priority. The correlated "
    "EXISTS decorrelates to a left-semi join on orderkey with the date "
    "rider in the join condition — one shuffle, no per-row probe",
    """
    select o.o_orderpriority,
           cast(count(*) as bigint) as n_orders
    from orders o
    where cast(o.o_orderdate as date) >= date '1996-01-01'
      and cast(o.o_orderdate as date) <  date '1996-04-01'
      and exists (
            select 1 from lineitem l
            where l.l_orderkey = o.o_orderkey
              and cast(l.l_shipdate as date) > cast(o.o_orderdate as date) + 20
      )
    group by o.o_orderpriority
    order by o.o_orderpriority
    """,
)
def late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").filter(
        (F.to_date("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.to_date("o_orderdate") < F.lit("1996-04-01").cast("date"))
    )
    li = _spread(_t(spark, sf_dir, "lineitem")).select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey)
            & (
                F.to_date(li.l_shipdate)
                > F.date_add(F.to_date(orders.o_orderdate), 20)
            ),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# TPC-H Q13 shape: outer-join aggregate distribution
# ---------------------------------------------------------------------------
@_register(
    "customer_order_distribution",
    "TPC-H Q13 shape: distribution of per-customer order counts "
    "(including zero-order customers via LEFT OUTER join with the "
    "priority filter in the join condition, not the WHERE — the "
    "classic outer-join-filter trap), double aggregation",
    """
    with c_orders as (
        select c.c_custkey,
               cast(count(o.o_orderkey) as bigint) as c_count
        from customer c
        left join orders o
          on c.c_custkey = o.o_custkey
         and o.o_orderpriority <> '1-URGENT'
        group by c.c_custkey
    )
    select c_count,
           cast(count(*) as bigint) as custdist
    from c_orders
    group by c_count
    order by custdist desc, c_count desc
    """,
)
def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = (
        _spread(_t(spark, sf_dir, "orders"))
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .select("o_custkey", "o_orderkey")
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("bigint").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).cast("bigint").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q17 shape: correlated scalar AVG subquery → grouped agg re-join
# ---------------------------------------------------------------------------
@_register(
    "small_quantity_part_revenue",
    "TPC-H Q17 shape: revenue from below-average-quantity lineitems of "
    "one brand. The correlated scalar avg-per-part subquery decorrelates "
    "to a groupBy(partkey) aggregate re-joined on partkey — one extra "
    "shuffle instead of a per-row subquery; avg is exact decimal "
    "sum / count so the 0.2x threshold compare is IEEE-identical",
    """
    with pa as (
        select l_partkey,
               cast(sum(cast(l_quantity as decimal(12,2))) as double)
                   / count(*) as avg_qty
        from lineitem
        group by l_partkey
    )
    select
        cast(count(*) as bigint) as n_small,
        cast(cast(sum(cast(l.l_extendedprice as decimal(18,2))) as double)
             / 7.0 as double) as avg_yearly
    from lineitem l
    join part p on p.p_partkey = l.l_partkey
    join pa on pa.l_partkey = l.l_partkey
    where p.p_brand = 'Brand#23'
      and cast(l.l_quantity as double) < 0.2 * pa.avg_qty
    """,
)
def small_quantity_part_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _spread(_t(spark, sf_dir, "lineitem"))
    part = F.broadcast(
        _t(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#23")
        .select("p_partkey")
    )
    # Decorrelated scalar subquery: per-part exact average, joined back.
    # Restricting the aggregate to the brand's parts first (broadcast
    # semi) keeps the agg O(brand rows), not O(corpus) — Catalyst can't
    # infer that pushdown from the correlated spelling, but the oracle
    # proves it value-identical.
    brand_li = li.join(
        part, li.l_partkey == F.col("p_partkey"), "left_semi"
    )
    pa = brand_li.groupBy("l_partkey").agg(
        (
            F.sum(F.col("l_quantity").cast("decimal(12,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_qty")
    )
    return (
        brand_li.join(pa, "l_partkey")
        .filter(F.col("l_quantity").cast("double") < 0.2 * F.col("avg_qty"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_small"),
            (
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast(
                    "double"
                )
                / 7.0
            )
            .cast("double")
            .alias("avg_yearly"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q11 shape: HAVING against a scalar subquery over the whole table
# ---------------------------------------------------------------------------
@_register(
    "top_customer_share",
    "TPC-H Q11 shape: customers whose exact-decimal lifetime spend "
    "exceeds 0.1% of the global total. The scalar total is a one-row "
    "aggregate broadcast into the filter (cross join of a 1-row "
    "relation), never a driver collect or a per-row subquery",
    """
    with per_cust as (
        select o_custkey,
               sum(cast(o_totalprice as decimal(18,2))) as total
        from orders
        group by o_custkey
    ),
    tot as (select sum(total) as g from per_cust)
    select per_cust.o_custkey as custkey,
           cast(total as double) as total_spend
    from per_cust, tot
    where cast(total as double) > cast(g as double) * 0.001
    order by total_spend desc, custkey
    """,
)
def top_customer_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _spread(_t(spark, sf_dir, "orders"))
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("total")
    )
    tot = per_cust.agg(F.sum("total").alias("g"))
    return (
        per_cust.crossJoin(F.broadcast(tot))
        .filter(
            F.col("total").cast("double") > F.col("g").cast("double") * 0.001
        )
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("total").cast("double").alias("total_spend"),
        )
        .orderBy(F.desc("total_spend"), F.asc("custkey"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q22 shape: scalar-subquery threshold + NOT EXISTS anti join
# ---------------------------------------------------------------------------
@_register(
    "idle_rich_customers",
    "TPC-H Q22 shape: above-average-balance customers with no orders "
    "since 2000 — scalar avg broadcast as a one-row relation, NOT "
    "EXISTS (with a date rider) as a left-anti join on custkey, "
    "grouped by market segment",
    """
    with avg_bal as (
        select cast(sum(cast(c_acctbal as decimal(18,2))) as double)
                   / count(*) as ab
        from customer
        where cast(c_acctbal as double) > 0.0
    )
    select c.c_mktsegment,
           cast(count(*) as bigint) as n_custs,
           cast(sum(cast(c.c_acctbal as decimal(18,2))) as double)
               as total_bal
    from customer c, avg_bal
    where cast(c.c_acctbal as double) > avg_bal.ab
      and not exists (
            select 1 from orders o
            where o.o_custkey = c.c_custkey
              and cast(o.o_orderdate as date) >= date '2000-01-01'
      )
    group by c.c_mktsegment
    order by c.c_mktsegment
    """,
)
def idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    avg_bal = cust.filter(F.col("c_acctbal").cast("double") > 0.0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("ab")
    )
    # the NOT EXISTS rider filters the anti-join build side, not the
    # probe side: a customer is kept only if NO post-cutoff order exists
    orders = (
        _t(spark, sf_dir, "orders")
        .filter(F.to_date("o_orderdate") >= F.lit("2000-01-01").cast("date"))
        .select("o_custkey")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal").cast("double") > F.col("ab"))
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_custs"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_bal"),
        )
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# TPC-H Q21 shape: EXISTS + NOT EXISTS double correlation → window counts
# ---------------------------------------------------------------------------
@_register(
    "sole_late_supplier",
    "TPC-H Q21 shape: suppliers who were the ONLY late shipper on a "
    "multi-supplier finished order. The EXISTS (another supplier in the "
    "order) and NOT EXISTS (another LATE supplier) pair decorrelates to "
    "two per-order distinct counts computed in ONE window pass over "
    "orderkey (size(collect_set(...))), replacing two correlated "
    "re-scans of lineitem with a single shuffle",
    """
    select s.s_name,
           cast(count(*) as bigint) as numwait
    from supplier s
    join lineitem l1 on s.s_suppkey = l1.l_suppkey
    join orders o on o.o_orderkey = l1.l_orderkey
    where o.o_orderstatus = 'F'
      and cast(l1.l_shipdate as date) > cast(o.o_orderdate as date) + 25
      and exists (
            select 1 from lineitem l2
            where l2.l_orderkey = l1.l_orderkey
              and l2.l_suppkey <> l1.l_suppkey
      )
      and not exists (
            select 1 from lineitem l3
            join orders o3 on o3.o_orderkey = l3.l_orderkey
            where l3.l_orderkey = l1.l_orderkey
              and l3.l_suppkey <> l1.l_suppkey
              and cast(l3.l_shipdate as date)
                    > cast(o3.o_orderdate as date) + 25
      )
    group by s.s_name
    order by numwait desc, s.s_name
    limit 20
    """,
)
def sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _spread(_t(spark, sf_dir, "lineitem")).select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    supp = F.broadcast(_t(spark, sf_dir, "supplier").select("s_suppkey", "s_name"))
    flagged = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .withColumn(
            "is_late",
            F.to_date("l_shipdate") > F.date_add(F.to_date("o_orderdate"), 25),
        )
        .select("l_orderkey", "l_suppkey", "is_late")
    )
    w = Window.partitionBy("l_orderkey")
    per_order = flagged.select(
        "l_orderkey",
        "l_suppkey",
        "is_late",
        F.size(F.collect_set("l_suppkey").over(w)).alias("n_supp"),
        F.size(
            F.collect_set(F.when(F.col("is_late"), F.col("l_suppkey"))).over(w)
        ).alias("n_late_supp"),
    )
    return (
        per_order.filter(
            F.col("is_late") & (F.col("n_supp") > 1) & (F.col("n_late_supp") == 1)
        )
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )
