"""TPC-H shape completion: the 11 query shapes rounds 1-4 had not yet
covered (Q2, Q6, Q7, Q8, Q9, Q12, Q14, Q15, Q16, Q19, Q20).

With this module every one of the 22 TPC-H query shapes has a
DataFrame implementation and a DuckDB oracle (Q1 pricing_summary, Q3
shipping_priority, Q4 late_shipment_priority, Q5 local_supplier_volume,
Q10 returned_item_revenue, Q11 top_customer_share, Q13
customer_order_distribution, Q17 small_quantity_part_revenue, Q18
large_volume_orders, Q21 sole_late_supplier, Q22 idle_rich_customers —
plus the 11 here). The testdata schema lacks partsupp,
commit/receipt dates, shipmode and containers, so those queries are
*shape* adaptations: the same plan stresses (correlated min subquery,
disjunctive pushdown, nested semi-joins, scalar-max view) over the
columns that exist; each docstring states the substitution.

Conventions (module-wide, same as relational_ext):
- money aggregates go through decimal(18,2) so sums are exact and
  engine-identical, then cast to double on output;
- double ratios divide two exact-decimal-derived doubles — one IEEE
  division, deterministic;
- every ORDER BY ends in a unique key so row order can't flap;
- dims broadcast, fact scans _spread, filters live next to the scan so
  Catalyst pushes them into the parquet read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbt_datbricks_demo_spark.queries.inventory import _register, _spread, _t

_DEC = "decimal(18,2)"


def _rev(price="l_extendedprice", disc="l_discount") -> F.Column:
    return F.col(price).cast(_DEC) * (F.lit(1) - F.col(disc).cast(_DEC))


_SQL_REV = (
    "cast(l.l_extendedprice as decimal(18,2))"
    " * (1 - cast(l.l_discount as decimal(18,2)))"
)


def _dates(col: str, lo: str, hi: str) -> F.Column:
    return (F.to_date(col) >= F.lit(lo).cast("date")) & (
        F.to_date(col) < F.lit(hi).cast("date")
    )


# ---------------------------------------------------------------------------
# Q2 shape: min-cost supplier (correlated scalar-min subquery)
# ---------------------------------------------------------------------------
@_register(
    "min_cost_supplier",
    "TPC-H Q2 shape (partsupp stands in as the per-(part,supplier) min "
    "unit price observed in lineitem): for LARGE parts of size 10-20, "
    "the EUROPE supplier with the minimum unit cost. The correlated "
    "min subquery decorrelates to one grouped arg-min "
    "(min-struct over (unit_cost, suppkey)) — no per-part re-probe; "
    "supplier/nation/region dims broadcast",
    """
    with offers as (
        select l.l_partkey, l.l_suppkey,
               min(l.l_extendedprice / l.l_quantity) as unit_cost
        from lineitem l
        group by l.l_partkey, l.l_suppkey
    ),
    eu as (
        select s.s_suppkey, s.s_name, s.s_acctbal
        from supplier s
        join nation n on s.s_nationkey = n.n_nationkey
        join region r on n.n_regionkey = r.r_regionkey
        where r.r_name = 'EUROPE'
    ),
    cand as (
        select p.p_partkey, p.p_name, o.unit_cost,
               e.s_suppkey, e.s_name, e.s_acctbal
        from offers o
        join eu e on o.l_suppkey = e.s_suppkey
        join part p on o.l_partkey = p.p_partkey
        where p.p_type = 'LARGE' and p.p_size between 10 and 20
    )
    select p_partkey, p_name,
           round(unit_cost, 6) as unit_cost6,
           s_name,
           round(cast(s_acctbal as double), 2) as acctbal
    from (
        select *, row_number() over (
            partition by p_partkey order by unit_cost, s_suppkey) as rn
        from cand
    )
    where rn = 1
    order by acctbal desc, p_partkey
    """,
)
def min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _spread(_t(spark, sf_dir, "lineitem"))
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu = F.broadcast(
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                nation.join(
                    F.broadcast(region),
                    nation.n_regionkey == region.r_regionkey,
                ).select("n_nationkey")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal")
    )
    parts = F.broadcast(
        _t(spark, sf_dir, "part")
        .filter((F.col("p_type") == "LARGE") & F.col("p_size").between(10, 20))
        .select("p_partkey", "p_name")
    )
    # broadcast-filter the fact BEFORE the (partkey, suppkey) aggregation:
    # only LARGE-10-20 parts and EUROPE suppliers reach the shuffle, so the
    # agg input shrinks by the dims' selectivity — at 100 TB this is the
    # difference between aggregating the corpus and aggregating a slice
    cand = (
        li.join(parts, li.l_partkey == parts.p_partkey)
        .join(eu, li.l_suppkey == eu.s_suppkey)
        .groupBy("p_partkey", "s_suppkey")
        .agg(
            F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias(
                "unit_cost"
            ),
            F.first("p_name").alias("p_name"),
            F.first("s_name").alias("s_name"),
            F.first("s_acctbal").alias("s_acctbal"),
        )
    )
    best = cand.groupBy("p_partkey").agg(
        F.min(
            F.struct(
                F.col("unit_cost").alias("u"),
                F.col("s_suppkey").alias("k"),
                F.col("s_name").alias("s_name"),
                F.col("s_acctbal").alias("b"),
            )
        ).alias("w"),
        F.first("p_name").alias("p_name"),  # constant within a partkey group
    )
    return best.select(
        "p_partkey",
        "p_name",
        F.round("w.u", 6).alias("unit_cost6"),
        F.col("w.s_name").alias("s_name"),
        F.round(F.col("w.b").cast("double"), 2).alias("acctbal"),
    ).orderBy(F.desc("acctbal"), "p_partkey")


# ---------------------------------------------------------------------------
# Q6 shape: forecast revenue change (pure filter-agg, full pushdown)
# ---------------------------------------------------------------------------
@_register(
    "forecast_revenue_change",
    "TPC-H Q6: revenue gain from dropping discounts — one tight "
    "filter-aggregate with every predicate pushed into the parquet "
    "scan (year of shipdate, discount band, quantity cap); "
    "decimal-exact sum, single-row result",
    f"""
    select
        cast(count(*) as bigint) as n_lineitems,
        cast(sum(cast(l.l_extendedprice as decimal(18,2))
                 * cast(l.l_discount as decimal(18,2))) as double) as revenue
    from lineitem l
    where cast(l.l_shipdate as date) >= date '1996-01-01'
      and cast(l.l_shipdate as date) <  date '1997-01-01'
      and l.l_discount between 0.05 and 0.07
      and l.l_quantity < 24
    """,
)
def forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _spread(_t(spark, sf_dir, "lineitem")).filter(
        _dates("l_shipdate", "1996-01-01", "1997-01-01")
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lineitems"),
        F.sum(F.col("l_extendedprice").cast(_DEC) * F.col("l_discount").cast(_DEC))
        .cast("double")
        .alias("revenue"),
    )


# ---------------------------------------------------------------------------
# Q7 shape: volume shipping between two nations
# ---------------------------------------------------------------------------
@_register(
    "volume_shipping",
    "TPC-H Q7: bilateral trade volume between NATION_1 and NATION_2 by "
    "ship year — the symmetric two-nation disjunction rides the "
    "broadcast nation joins; orders⋈lineitem is the only big shuffle; "
    "decimal-exact revenue",
    f"""
    select ns.n_name as supp_nation, nc.n_name as cust_nation,
           year(cast(l.l_shipdate as date)) as ship_year,
           cast(count(*) as bigint) as n_lineitems,
           cast(sum({_SQL_REV}) as double) as revenue
    from lineitem l
    join supplier s on l.l_suppkey = s.s_suppkey
    join nation ns  on s.s_nationkey = ns.n_nationkey
    join orders o   on l.l_orderkey = o.o_orderkey
    join customer c on o.o_custkey = c.c_custkey
    join nation nc  on c.c_nationkey = nc.n_nationkey
    where ((ns.n_name = 'NATION_1' and nc.n_name = 'NATION_2')
        or (ns.n_name = 'NATION_2' and nc.n_name = 'NATION_1'))
      and cast(l.l_shipdate as date) >= date '1996-01-01'
      and cast(l.l_shipdate as date) <  date '1998-01-01'
    group by ns.n_name, nc.n_name, year(cast(l.l_shipdate as date))
    order by supp_nation, cust_nation, ship_year
    """,
)
def volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    supp = F.broadcast(
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = F.broadcast(
        _t(spark, sf_dir, "customer")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    li = _spread(_t(spark, sf_dir, "lineitem")).filter(
        _dates("l_shipdate", "1996-01-01", "1998-01-01")
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year(F.to_date("l_shipdate")).alias("ship_year"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lineitems"),
            F.sum(_rev()).cast("double").alias("revenue"),
        )
        .orderBy("supp_nation", "cust_nation", "ship_year")
    )


# ---------------------------------------------------------------------------
# Q8 shape: national market share
# ---------------------------------------------------------------------------
@_register(
    "nation_market_share",
    "TPC-H Q8: NATION_3's share of ECONOMY-part revenue sold to ASIA "
    "customers by order year — conditional-sum ratio of two exact "
    "decimal aggregates; all dims broadcast, one fact shuffle",
    f"""
    select year(cast(o.o_orderdate as date)) as order_year,
           cast(sum(case when ns.n_name = 'NATION_3'
                         then {_SQL_REV} else cast(0 as decimal(18,2)) end)
                as double)
             / cast(sum({_SQL_REV}) as double) as mkt_share,
           cast(count(*) as bigint) as n_lineitems
    from lineitem l
    join part p     on l.l_partkey = p.p_partkey
    join supplier s on l.l_suppkey = s.s_suppkey
    join nation ns  on s.s_nationkey = ns.n_nationkey
    join orders o   on l.l_orderkey = o.o_orderkey
    join customer c on o.o_custkey = c.c_custkey
    join nation nc  on c.c_nationkey = nc.n_nationkey
    join region r   on nc.n_regionkey = r.r_regionkey
    where r.r_name = 'ASIA'
      and p.p_type = 'ECONOMY'
      and cast(o.o_orderdate as date) >= date '1996-01-01'
      and cast(o.o_orderdate as date) <  date '1998-01-01'
    group by year(cast(o.o_orderdate as date))
    order by order_year
    """,
)
def nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia_nk = F.broadcast(
        nation.join(
            F.broadcast(region), nation.n_regionkey == region.r_regionkey
        ).select(F.col("n_nationkey").alias("asia_nk"))
    )
    cust = F.broadcast(
        _t(spark, sf_dir, "customer")
        .join(asia_nk, F.col("c_nationkey") == F.col("asia_nk"))
        .select("c_custkey")
    )
    supp = F.broadcast(
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    parts = F.broadcast(
        _t(spark, sf_dir, "part")
        .filter(F.col("p_type") == "ECONOMY")
        .select("p_partkey")
    )
    orders = _t(spark, sf_dir, "orders").filter(
        _dates("o_orderdate", "1996-01-01", "1998-01-01")
    )
    li = _spread(_t(spark, sf_dir, "lineitem"))
    zero = F.lit(0).cast(_DEC)
    nat_rev = F.sum(
        F.when(F.col("supp_nation") == "NATION_3", _rev()).otherwise(zero)
    ).cast("double")
    tot_rev = F.sum(_rev()).cast("double")
    return (
        li.join(parts, F.col("l_partkey") == F.col("p_partkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.year(F.to_date("o_orderdate")).alias("order_year"))
        .agg(
            (nat_rev / tot_rev).alias("mkt_share"),
            F.count(F.lit(1)).cast("bigint").alias("n_lineitems"),
        )
        .orderBy("order_year")
    )


# ---------------------------------------------------------------------------
# Q9 shape: product-type profit
# ---------------------------------------------------------------------------
@_register(
    "product_type_profit",
    "TPC-H Q9 shape (supply cost stands in as 0.8 × p_retailprice per "
    "unit — no partsupp in the schema): profit on red parts by "
    "supplier nation and order year; revenue and cost summed as "
    "separate exact decimals, subtracted once as doubles",
    f"""
    select ns.n_name as supp_nation,
           year(cast(o.o_orderdate as date)) as order_year,
           cast(count(*) as bigint) as n_lineitems,
           cast(sum({_SQL_REV}) as double)
             - cast(sum(cast(0.8 as decimal(2,1))
                        * cast(p.p_retailprice as decimal(12,2))
                        * cast(l.l_quantity as decimal(12,2))) as double)
               as profit
    from lineitem l
    join part p     on l.l_partkey = p.p_partkey
    join supplier s on l.l_suppkey = s.s_suppkey
    join nation ns  on s.s_nationkey = ns.n_nationkey
    join orders o   on l.l_orderkey = o.o_orderkey
    where p.p_name like 'red%'
    group by ns.n_name, year(cast(o.o_orderdate as date))
    order by supp_nation, order_year
    """,
)
def product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    parts = F.broadcast(
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey", "p_retailprice")
    )
    supp = F.broadcast(
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(_t(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = _spread(_t(spark, sf_dir, "lineitem"))
    cost = (
        F.lit(0.8).cast("decimal(2,1)")
        * F.col("p_retailprice").cast("decimal(12,2)")
        * F.col("l_quantity").cast("decimal(12,2)")
    )
    return (
        li.join(parts, F.col("l_partkey") == F.col("p_partkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            "supp_nation", F.year(F.to_date("o_orderdate")).alias("order_year")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lineitems"),
            (F.sum(_rev()).cast("double") - F.sum(cost).cast("double")).alias(
                "profit"
            ),
        )
        .orderBy("supp_nation", "order_year")
    )


# ---------------------------------------------------------------------------
# Q12 shape: late shipments by category, priority split
# ---------------------------------------------------------------------------
@_register(
    "late_shipment_modes",
    "TPC-H Q12 shape (l_returnflag stands in for shipmode; shipped "
    ">30 days after order stands in for receipt-after-commit): per "
    "flag, counts of late lines split by high vs low order priority — "
    "the conditional-count pivot over one orders⋈lineitem join",
    """
    select l.l_returnflag,
           cast(sum(case when o.o_orderpriority in ('1-URGENT', '2-HIGH')
                         then 1 else 0 end) as bigint) as high_line_count,
           cast(sum(case when o.o_orderpriority not in ('1-URGENT', '2-HIGH')
                         then 1 else 0 end) as bigint) as low_line_count
    from lineitem l
    join orders o on l.l_orderkey = o.o_orderkey
    where cast(l.l_shipdate as date) >= date '1997-01-01'
      and cast(l.l_shipdate as date) <  date '1998-01-01'
      and cast(l.l_shipdate as date) > cast(o.o_orderdate as date) + 30
    group by l.l_returnflag
    order by l.l_returnflag
    """,
)
def late_shipment_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _spread(_t(spark, sf_dir, "lineitem")).filter(
        _dates("l_shipdate", "1997-01-01", "1998-01-01")
    )
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.to_date("l_shipdate") > F.date_add(F.to_date("o_orderdate"), 30))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias(
                "high_line_count"
            ),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias(
                "low_line_count"
            ),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# Q14 shape: promotion revenue effect
# ---------------------------------------------------------------------------
@_register(
    "promo_revenue_effect",
    "TPC-H Q14: share of one month's revenue from PROMO parts — "
    "conditional-sum ratio (×100) of exact decimals; part dim "
    "broadcast, single-row result",
    f"""
    select
        100.0 * cast(sum(case when p.p_type = 'PROMO'
                              then {_SQL_REV} else cast(0 as decimal(18,2)) end)
                     as double)
              / cast(sum({_SQL_REV}) as double) as promo_revenue_pct,
        cast(count(*) as bigint) as n_lineitems
    from lineitem l
    join part p on l.l_partkey = p.p_partkey
    where cast(l.l_shipdate as date) >= date '1996-09-01'
      and cast(l.l_shipdate as date) <  date '1996-10-01'
    """,
)
def promo_revenue_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _spread(_t(spark, sf_dir, "lineitem")).filter(
        _dates("l_shipdate", "1996-09-01", "1996-10-01")
    )
    parts = F.broadcast(_t(spark, sf_dir, "part").select("p_partkey", "p_type"))
    zero = F.lit(0).cast(_DEC)
    promo = F.sum(
        F.when(F.col("p_type") == "PROMO", _rev()).otherwise(zero)
    ).cast("double")
    total = F.sum(_rev()).cast("double")
    return (
        li.join(parts, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (F.lit(100.0) * promo / total).alias("promo_revenue_pct"),
            F.count(F.lit(1)).cast("bigint").alias("n_lineitems"),
        )
    )


# ---------------------------------------------------------------------------
# Q15 shape: top supplier (scalar-max view)
# ---------------------------------------------------------------------------
@_register(
    "top_supplier_revenue",
    "TPC-H Q15: supplier(s) achieving the maximum quarterly revenue — "
    "the revenue view aggregates once, the scalar max attaches as a "
    "one-row broadcast, and the equality filter runs on the EXACT "
    "decimal (never the double cast), so ties surface all achievers",
    f"""
    with rev as (
        select l.l_suppkey, sum({_SQL_REV}) as total_rev
        from lineitem l
        where cast(l.l_shipdate as date) >= date '1996-01-01'
          and cast(l.l_shipdate as date) <  date '1996-04-01'
        group by l.l_suppkey
    )
    select s.s_suppkey, s.s_name,
           cast(r.total_rev as double) as total_revenue
    from rev r
    join supplier s on r.l_suppkey = s.s_suppkey
    where r.total_rev = (select max(total_rev) from rev)
    order by s.s_suppkey
    """,
)
def top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _spread(_t(spark, sf_dir, "lineitem")).filter(
        _dates("l_shipdate", "1996-01-01", "1996-04-01")
    )
    rev = li.groupBy("l_suppkey").agg(F.sum(_rev()).alias("total_rev"))
    mx = rev.agg(F.max("total_rev").alias("mx"))
    supp = F.broadcast(
        _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    )
    return (
        rev.join(F.broadcast(mx))  # one-row scalar attach
        .filter(F.col("total_rev") == F.col("mx"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_rev").cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Q16 shape: supplier counts by part attribute
# ---------------------------------------------------------------------------
@_register(
    "supplier_part_counts",
    "TPC-H Q16 shape (lineitem stands in for partsupp; negative "
    "account balance stands in for the complaints filter): distinct "
    "suppliers per (brand, type, size) for selected sizes, excluding "
    "one brand, PROMO parts, and flagged suppliers via an anti-join",
    """
    select p.p_brand, p.p_type, p.p_size,
           cast(count(distinct l.l_suppkey) as bigint) as supplier_cnt
    from lineitem l
    join part p on l.l_partkey = p.p_partkey
    where p.p_brand <> 'Brand#5'
      and p.p_type <> 'PROMO'
      and p.p_size in (1, 14, 23, 45)
      and l.l_suppkey not in (
            select s_suppkey from supplier where s_acctbal < 0
      )
    group by p.p_brand, p.p_type, p.p_size
    order by supplier_cnt desc, p.p_brand, p.p_type, p.p_size
    """,
)
def supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    parts = F.broadcast(
        _t(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#5")
            & (F.col("p_type") != "PROMO")
            & F.col("p_size").isin(1, 14, 23, 45)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    flagged = F.broadcast(
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    li = _spread(_t(spark, sf_dir, "lineitem")).select("l_partkey", "l_suppkey")
    return (
        li.join(parts, F.col("l_partkey") == F.col("p_partkey"))
        .join(flagged, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").cast("bigint").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


# ---------------------------------------------------------------------------
# Q19 shape: disjunctive brand/size/quantity predicates
# ---------------------------------------------------------------------------
@_register(
    "brand_quantity_revenue",
    "TPC-H Q19: revenue under a 3-way disjunction of (brand, size "
    "range, quantity range) conjuncts — the planner stress is pushing "
    "a disjunction through a broadcast join without exploding it; "
    "decimal-exact sum, single row",
    f"""
    select cast(count(*) as bigint) as n_lineitems,
           cast(sum({_SQL_REV}) as double) as revenue
    from lineitem l
    join part p on l.l_partkey = p.p_partkey
    where (p.p_brand = 'Brand#1' and p.p_size between 1 and 5
           and l.l_quantity between 1 and 11)
       or (p.p_brand = 'Brand#2' and p.p_size between 1 and 10
           and l.l_quantity between 10 and 20)
       or (p.p_brand = 'Brand#3' and p.p_size between 1 and 15
           and l.l_quantity between 20 and 30)
    """,
)
def brand_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    parts = F.broadcast(
        _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    )
    li = _spread(_t(spark, sf_dir, "lineitem"))
    clause = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(parts, F.col("l_partkey") == F.col("p_partkey"))
        .filter(clause)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lineitems"),
            F.sum(_rev()).cast("double").alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# Q20 shape: dominant suppliers of selected parts (nested semi-joins)
# ---------------------------------------------------------------------------
@_register(
    "dominant_supplier_parts",
    "TPC-H Q20 shape (no partsupp.availqty: 'dominant' = shipped more "
    "than half a part's 1996 volume): EUROPE suppliers counted by how "
    "many red parts they dominate — nested semi-join chain with the "
    "correlated half-of-total threshold decorrelated to one grouped "
    "total re-joined on partkey; exact decimal quantity compare "
    "(2·supplier_qty > total_qty)",
    """
    with q as (
        select l.l_partkey, l.l_suppkey,
               sum(cast(l.l_quantity as decimal(18,2))) as qty
        from lineitem l
        join part p on l.l_partkey = p.p_partkey
        where p.p_name like 'red%'
          and cast(l.l_shipdate as date) >= date '1996-01-01'
          and cast(l.l_shipdate as date) <  date '1997-01-01'
        group by l.l_partkey, l.l_suppkey
    ),
    t as (select l_partkey, sum(qty) as total_qty from q group by l_partkey),
    dom as (
        select q.l_suppkey, q.l_partkey
        from q join t on q.l_partkey = t.l_partkey
        where 2 * q.qty > t.total_qty
    )
    select s.s_suppkey, s.s_name,
           cast(count(*) as bigint) as n_dominant_parts
    from dom
    join supplier s on dom.l_suppkey = s.s_suppkey
    join nation n   on s.s_nationkey = n.n_nationkey
    join region r   on n.n_regionkey = r.r_regionkey
    where r.r_name = 'EUROPE'
    group by s.s_suppkey, s.s_name
    order by s.s_suppkey
    """,
)
def dominant_supplier_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    parts = F.broadcast(
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    li = _spread(_t(spark, sf_dir, "lineitem")).filter(
        _dates("l_shipdate", "1996-01-01", "1997-01-01")
    )
    q = (
        li.join(parts, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast(_DEC)).alias("qty"))
    )
    t = q.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum("qty").alias("total_qty")
    )
    dom = q.join(t, q.l_partkey == t.pk).filter(
        F.lit(2) * F.col("qty") > F.col("total_qty")
    )
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu_supp = F.broadcast(
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                nation.join(
                    F.broadcast(region),
                    nation.n_regionkey == region.r_regionkey,
                ).select("n_nationkey")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name")
    )
    return (
        dom.join(eu_supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_dominant_parts"))
        .orderBy("s_suppkey")
    )
