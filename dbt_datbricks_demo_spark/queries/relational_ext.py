"""Round-3 relational/curation surface extensions.

CUBE multi-granularity aggregation, FILTER-style conditional aggregates
(count_if / bool_and / bool_or / struct-max argmax), a generated date
spine (dbt_utils.date_spine parity — the gaps-in-a-calendar primitive),
multiset set operations (EXCEPT ALL / INTERSECT ALL), Shannon-entropy
distribution profiling, and corpus vocabulary construction — each with
a DuckDB oracle computing literally the same values.

Determinism conventions follow queries/inventory.py: exact decimal sums
cast to double at the edge, unique tie-breaks on every top-k, floating
reductions with engine-order-dependent low bits rounded to 6 dp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbt_datbricks_demo_spark.queries.inventory import _register, _spread, _t


# ---------------------------------------------------------------------------
# CUBE: every granularity of (status, priority) in one pass
# ---------------------------------------------------------------------------
@_register(
    "cube_report",
    "GROUP BY CUBE over (o_orderstatus, o_orderpriority): all four "
    "grouping granularities in one shuffle, disambiguated by "
    "grouping_id — partial/final hash agg, no union of scans",
    """
    select
        o_orderstatus,
        o_orderpriority,
        cast(grouping(o_orderstatus) * 2 + grouping(o_orderpriority)
             as bigint)                                         as gid,
        count(*)                                                as n_orders,
        cast(sum(cast(o_totalprice as decimal(18,2))) as double) as sum_total
    from orders
    group by cube (o_orderstatus, o_orderpriority)
    """,
)
def cube_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _spread(_t(spark, sf_dir, "orders"))
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().cast("bigint").alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_total"),
        )
        .select("o_orderstatus", "o_orderpriority", "gid", "n_orders", "sum_total")
    )


# ---------------------------------------------------------------------------
# Conditional aggregates: FILTER-clause family + deterministic argmax
# ---------------------------------------------------------------------------
@_register(
    "conditional_agg_report",
    "count_if / bool_and / bool_or conditional aggregates plus a "
    "deterministic argmax via max(struct(price, orderkey)) — one "
    "partial+final hash agg, no self-join for the argmax",
    """
    select
        l_returnflag,
        count(*)                                            as n_rows,
        count(*) filter (where l_quantity > 30)             as n_high_qty,
        bool_and(l_extendedprice > 0)                       as all_price_pos,
        bool_or(l_discount > 0.07)                          as any_deep_disc,
        max(l_extendedprice)                                as max_price,
        (max(struct_pack(p := l_extendedprice, k := l_orderkey))).k
                                                            as max_price_orderkey
    from lineitem
    group by l_returnflag
    """,
)
def conditional_agg_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _spread(_t(spark, sf_dir, "lineitem"))
    # argmax with a unique tie-break: max over (price, orderkey) pairs is
    # order-independent even when the max price is shared by many rows
    pair = F.struct(F.col("l_extendedprice"), F.col("l_orderkey"))
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_if(F.col("l_quantity") > 30).alias("n_high_qty"),
        F.bool_and(F.col("l_extendedprice") > 0).alias("all_price_pos"),
        F.bool_or(F.col("l_discount") > 0.07).alias("any_deep_disc"),
        F.max("l_extendedprice").alias("max_price"),
        F.max(pair).getField("l_orderkey").alias("max_price_orderkey"),
    )


# ---------------------------------------------------------------------------
# Date spine (dbt_utils.date_spine parity)
# ---------------------------------------------------------------------------
@_register(
    "date_spine",
    "Generated calendar spine (sequence+explode, no driver loop) left-"
    "joined to daily order counts — surfaces zero-activity days that a "
    "plain GROUP BY can never emit; the generator is in-plan so the "
    "spine scales to any range without collect()",
    """
    with bounds as (
        select min(cast(o_orderdate as date)) as lo,
               max(cast(o_orderdate as date)) as hi
        from orders
    ),
    spine as (
        select cast(unnest(generate_series(cast(lo as timestamp),
                                           cast(hi as timestamp),
                                           interval 1 day)) as date) as day
        from bounds
    ),
    daily as (
        select cast(o_orderdate as date) as day,
               count(*)                  as n,
               cast(sum(cast(o_totalprice as decimal(18,2))) as double) as total
        from orders
        group by 1
    )
    select spine.day                as day,
           coalesce(daily.n, 0)     as n_orders,
           coalesce(daily.total, cast(0.0 as double)) as total_price
    from spine left join daily using (day)
    """,
)
def date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _spread(_t(spark, sf_dir, "orders"))
    bounds = orders.agg(
        F.min(F.to_date("o_orderdate")).alias("lo"),
        F.max(F.to_date("o_orderdate")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("day")
    )
    daily = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("total"),
    )
    return spine.join(daily, "day", "left").select(
        "day",
        F.coalesce(F.col("n"), F.lit(0)).alias("n_orders"),
        F.coalesce(F.col("total"), F.lit(0.0)).alias("total_price"),
    )


# ---------------------------------------------------------------------------
# Multiset set operations (EXCEPT ALL / INTERSECT ALL)
# ---------------------------------------------------------------------------
@_register(
    "set_ops_all_report",
    "EXCEPT ALL and INTERSECT ALL multiset semantics (duplicates "
    "preserved by count arithmetic, not row explosion) over customer "
    "keys of two order-status populations",
    """
    select 'except_all' as op,
           count(*)            as n_rows,
           count(distinct c)   as n_keys
    from (
        select o_custkey as c from orders where o_orderstatus = 'F'
        except all
        select o_custkey as c from orders where o_orderstatus = 'O'
    )
    union all
    select 'intersect_all' as op,
           count(*)            as n_rows,
           count(distinct c)   as n_keys
    from (
        select o_custkey as c from orders where o_orderstatus = 'F'
        intersect all
        select o_custkey as c from orders where o_orderstatus = 'O'
    )
    """,
)
def set_ops_all_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _spread(_t(spark, sf_dir, "orders"))
    f_keys = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("c")
    )
    o_keys = orders.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("c")
    )

    def summarize(df: DataFrame, op: str) -> DataFrame:
        return df.agg(
            F.lit(op).alias("op"),
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("c").alias("n_keys"),
        ).select("op", "n_rows", "n_keys")

    return summarize(f_keys.exceptAll(o_keys), "except_all").unionByName(
        summarize(f_keys.intersectAll(o_keys), "intersect_all")
    )


# ---------------------------------------------------------------------------
# Shannon entropy of a categorical distribution (data diagnostics)
# ---------------------------------------------------------------------------
@_register(
    "entropy_report",
    "Per-day Shannon entropy (log2) of the event-type distribution — "
    "two chained hash aggs (day,type)->counts->entropy; a skew/drift "
    "monitor for training-data composition. Rounded to 6 dp: the "
    "per-type term is IEEE-identical on both engines, only the final "
    "few-term summation order differs",
    """
    select cast(date_trunc('day', ts) as date) as day,
           count(*)                            as n_events,
           round(entropy(event_type), 6)       as type_entropy
    from events
    group by 1
    """,
)
def entropy_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _spread(_t(spark, sf_dir, "events"))
    counts = ev.groupBy(
        F.to_date(F.date_trunc("day", "ts")).alias("day"),
        F.col("event_type"),
    ).agg(F.count(F.lit(1)).alias("c"))
    # the (day, type) count table is tiny (days x ~6 types) — the heavy
    # lifting happened in the first partial/final hash agg over events
    totals = counts.groupBy("day").agg(F.sum("c").alias("tot"))
    p = F.col("c") / F.col("tot")
    return (
        counts.join(F.broadcast(totals), "day")
        .groupBy("day")
        .agg(
            F.max("tot").alias("n_events"),
            # -sum(p*log2(p)): p is a ratio of exact ints so each term is
            # bit-identical cross-engine; only the few-term sum order
            # differs, absorbed by the 6 dp rounding
            F.round(-F.sum(p * F.log2(p)), 6).alias("type_entropy"),
        )
        .select("day", "n_events", "type_entropy")
    )


# ---------------------------------------------------------------------------
# Corpus vocabulary construction (tokenizer-training precursor)
# ---------------------------------------------------------------------------
@_register(
    "vocabulary_report",
    "Corpus-level vocabulary: explode tokens -> hash agg counts -> "
    "top-100 by (count desc, token asc) via TakeOrderedAndProject — the "
    "term-frequency pass every tokenizer/vocab build starts with; "
    "map-side partial aggregation absorbs the token explosion before "
    "the shuffle",
    """
    select t as token, count(*) as cnt
    from (
        select unnest(string_split_regex(trim(lower(text)), '\\s+')) as t
        from documents
    )
    where t <> ''
    group by t
    order by cnt desc, token asc
    limit 100
    """,
)
def vocabulary_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _spread(_t(spark, sf_dir, "documents"))
    return (
        docs.select(
            F.explode(
                F.split(F.trim(F.lower(F.col("text"))), r"\s+")
            ).alias("token")
        )
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("token"))
        .limit(100)
    )


# ---------------------------------------------------------------------------
# TPC-H Q3 shape: selective 3-way join -> agg -> top-k
# ---------------------------------------------------------------------------
@_register(
    "shipping_priority",
    "TPC-H Q3 shape: filtered customer segment ⋈ orders ⋈ lineitem -> "
    "revenue agg -> top-10. The customer side prunes to (c_custkey) and "
    "broadcasts; lineitem joins shuffle on orderkey with the date "
    "filters pushed to the scans; decimal-exact revenue; "
    "TakeOrderedAndProject for the top-k (no global sort)",
    """
    select
        l.l_orderkey                          as orderkey,
        cast(o.o_orderdate as date)           as orderdate,
        o.o_orderpriority                     as orderpriority,
        cast(sum(cast(l.l_extendedprice as decimal(18,2))
                 * (1 - cast(l.l_discount as decimal(18,2)))) as double)
                                              as revenue
    from customer c
    join orders o on c.c_custkey = o.o_custkey
    join lineitem l on l.l_orderkey = o.o_orderkey
    where c.c_mktsegment = 'BUILDING'
      and cast(o.o_orderdate as date) < date '1997-01-01'
      and cast(l.l_shipdate as date) > date '1996-06-30'
    group by l.l_orderkey, cast(o.o_orderdate as date), o.o_orderpriority
    order by revenue desc, orderkey asc
    limit 10
    """,
)
def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = _t(spark, sf_dir, "orders").filter(
        F.to_date("o_orderdate") < F.lit("1997-01-01").cast("date")
    )
    li = _spread(_t(spark, sf_dir, "lineitem")).filter(
        F.to_date("l_shipdate") > F.lit("1996-06-30").cast("date")
    )
    revenue = F.sum(
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
    ).cast("double")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(
            F.col("l_orderkey").alias("orderkey"),
            F.to_date("o_orderdate").alias("orderdate"),
            F.col("o_orderpriority").alias("orderpriority"),
        )
        .agg(revenue.alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Exact-decimal Pearson correlation (order-independent bivariate stats)
# ---------------------------------------------------------------------------
@_register(
    "corr_report",
    "Pearson correlation from exact decimal sums — corr(x,y) = "
    "(n·Σxy − Σx·Σy) / sqrt((n·Σx² − Σx²)(n·Σy² − Σy²)) with every sum "
    "accumulated as decimal (order-free across any partitioning; the "
    "engines' native corr() merges Welford states in partition order, "
    "whose low bits are nondeterministic). One partial+final hash agg",
    """
    with s as (
        select
            l_returnflag,
            count(*)                                            as n,
            sum(cast(l_quantity as decimal(12,2)))              as sx,
            sum(cast(l_discount as decimal(12,2)))              as sy,
            sum(cast(l_quantity as decimal(12,2))
                * cast(l_quantity as decimal(12,2)))            as sxx,
            sum(cast(l_discount as decimal(12,2))
                * cast(l_discount as decimal(12,2)))            as syy,
            sum(cast(l_quantity as decimal(12,2))
                * cast(l_discount as decimal(12,2)))            as sxy
        from lineitem
        group by l_returnflag
    )
    select
        l_returnflag,
        n,
        round(
            cast(cast(n as decimal(10,0)) * sxy - sx * sy as double)
            / sqrt(cast(cast(n as decimal(10,0)) * sxx - sx * sx as double)
                   * cast(cast(n as decimal(10,0)) * syy - sy * sy as double)),
            6
        ) as qty_disc_corr
    from s
    """,
)
def corr_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _spread(_t(spark, sf_dir, "lineitem"))
    x = F.col("l_quantity").cast("decimal(12,2)")
    y = F.col("l_discount").cast("decimal(12,2)")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"),
    )
    nd = F.col("n").cast("decimal(10,0)")
    num = (nd * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = F.sqrt(
        (nd * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
        * (nd * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    )
    return s.select(
        "l_returnflag",
        "n",
        F.round(num / den, 6).alias("qty_disc_corr"),
    )


# ---------------------------------------------------------------------------
# Numeric histogram (width_bucket binning)
# ---------------------------------------------------------------------------
_HIST_LO, _HIST_HI, _HIST_BINS = 0.0, 600000.0, 20


@_register(
    "value_histogram",
    "equi-width value histogram via width_bucket — the binning is a "
    "narrow expression, the histogram one partial+final hash agg over "
    "at most bins+2 groups; distribution diagnostics at any scale "
    "without a sort or a window",
    f"""
    -- DuckDB 1.0 has no width_bucket; this is its exact definition
    -- (left-closed equi-width bins, under/overflow buckets 0 and n+1)
    select cast(case when o_totalprice < {_HIST_LO} then 0
                     when o_totalprice >= {_HIST_HI} then {_HIST_BINS + 1}
                     else floor((o_totalprice - {_HIST_LO})
                                * {_HIST_BINS}
                                / ({_HIST_HI} - {_HIST_LO})) + 1
                end as bigint)                            as bucket,
           count(*)                                       as n,
           cast(min(cast(o_totalprice as decimal(18,2))) as double) as lo_val,
           cast(max(cast(o_totalprice as decimal(18,2))) as double) as hi_val
    from orders
    group by 1
    """,
)
def value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _spread(_t(spark, sf_dir, "orders"))
    bucket = F.width_bucket(
        F.col("o_totalprice"), F.lit(_HIST_LO), F.lit(_HIST_HI), F.lit(_HIST_BINS)
    ).cast("bigint")
    return orders.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        F.min(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("lo_val"),
        F.max(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("hi_val"),
    )


# ---------------------------------------------------------------------------
# Morton (Z-order) clustering keys — the math behind OPTIMIZE ZORDER
# ---------------------------------------------------------------------------
_Z_BITS = 8  # bits per dimension -> 16-bit interleaved key


def _spark_morton(a, b, bits: int = _Z_BITS):
    # Column.__or__ is LOGICAL or in PySpark; bitwise is .bitwiseOR
    out = F.lit(0).cast("bigint")
    for i in range(bits):
        out = out.bitwiseOR(
            a.bitwiseAND(F.lit(1 << i)) * F.lit(1 << (i + 1))
        ).bitwiseOR(b.bitwiseAND(F.lit(1 << i)) * F.lit(1 << i))
    return out


def _sql_morton(a: str, b: str, bits: int = _Z_BITS) -> str:
    terms = []
    for i in range(bits):
        terms.append(f"(({a} & {1 << i}) * {1 << (i + 1)})")
        terms.append(f"(({b} & {1 << i}) * {1 << i})")
    return " | ".join(terms)


@_register(
    "zorder_keys",
    "Morton (Z-order) key computation — bit-interleaving two bucketed "
    "dimensions into one clustering key so a range-partitioned write "
    "groups rows that are close in BOTH dimensions (the math behind "
    "OPTIMIZE ZORDER / multi-dimensional file skipping). Pure integer "
    "expressions; summarized per key-range so the output stays small",
    f"""
    with keyed as (
        select cast({_sql_morton(
            f"cast(o_custkey % {1 << _Z_BITS} as bigint)",
            f"cast(date_diff('day', date '1995-01-01', cast(o_orderdate as date)) % {1 << _Z_BITS} as bigint)"
        )} as bigint) as zkey
        from orders
    )
    -- // : DuckDB integer division ( / on ints is FLOAT division, and
    -- cast(double as bigint) rounds-to-nearest, not floor)
    select cast(zkey // 4096 as bigint) as zrange,
           count(*)                    as n,
           cast(min(zkey) as bigint)   as min_z,
           cast(max(zkey) as bigint)   as max_z
    from keyed
    group by 1
    """,
)
def zorder_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _spread(_t(spark, sf_dir, "orders"))
    a = (F.col("o_custkey") % (1 << _Z_BITS)).cast("bigint")
    b = (
        F.datediff(F.to_date("o_orderdate"), F.lit("1995-01-01").cast("date"))
        % (1 << _Z_BITS)
    ).cast("bigint")
    z = _spark_morton(a, b)
    return (
        orders.select(z.alias("zkey"))
        .groupBy(F.floor(F.col("zkey") / 4096).cast("bigint").alias("zrange"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("zkey").cast("bigint").alias("min_z"),
            F.max("zkey").cast("bigint").alias("max_z"),
        )
    )


# ---------------------------------------------------------------------------
# Fuzzy matching (record linkage with blocking)
# ---------------------------------------------------------------------------
@_register(
    "fuzzy_match_report",
    "record-linkage shape: FastSS deletion-neighborhood similarity "
    "join — two names within levenshtein <= 2 MUST share a <=2-"
    "deletion variant (pigeonhole over the edit alignment), so "
    "candidates come from an equi-join on (brand, variant) over "
    "distinct names instead of an all-pairs block; exact thresholded "
    "levenshtein verifies; top-50 closest with unique tie-break",
    """
    select a.p_partkey as key_a, b.p_partkey as key_b,
           levenshtein(a.p_name, b.p_name) as edit_dist
    from part a join part b
      on a.p_brand = b.p_brand and a.p_partkey < b.p_partkey
    where levenshtein(a.p_name, b.p_name) <= 2
    order by edit_dist asc, key_a asc, key_b asc
    limit 50
    """,
)
def fuzzy_match_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brand-only blocking is quadratic at scale (25 brands ⇒ per-block
    pairs ∝ N²/25 — measured 43× time at 10× data), and length banding
    cannot save it in this corpus: p_name spans only 7–12 chars, so any
    band wide enough to be lossless at k=8 admits everything. The
    scalable form is the classic FastSS deletion-neighborhood join at a
    tight, record-linkage-realistic threshold k=2: any Levenshtein
    alignment with ≤2 edits yields a common subsequence reachable by
    ≤2 single-char deletions from EACH side, so every true pair shares
    at least one variant in D≤2(name) (1 + L + C(L,2) ≈ 79 variants of
    a ≤12-char string). Candidates are an equi-join on
    (brand, variant) over DISTINCT (brand, name) rows — work scales
    with distinct names × 79, not with pairs — then exact thresholded
    levenshtein (banded DP, -1 past k) verifies, killing both deletion-
    variant false positives and any variant-collision concern. Equal
    names (dist 0) never enter the variant join: they expand directly
    from the per-name key lists, so a name repeated m times costs its
    C(m,2) output pairs exactly once, not 79·m² join rows. All stages
    are codegen (explode over position sequences + substr arithmetic —
    no interpreted HOFs); the final top-50 is TakeOrderedAndProject.
    Candidate volume is output-bound: pairs ≈ true matches + rare
    same-variant misses, each verified in O(k·L)."""
    part = _spread(_t(spark, sf_dir, "part")).select(
        F.col("p_brand").alias("brand"),
        F.col("p_partkey").alias("key"),
        F.col("p_name").alias("name"),
    )
    names = part.groupBy("brand", "name").agg(F.count(F.lit(1)).alias("cnt"))

    # D<=2 deletion variants per distinct name. (d1, d2) enumerates each
    # variant once: (0,0) = the name itself, (0,j) = delete position j,
    # (i,j) with 0 < i < j = delete positions i and j.
    nm = F.col("name")
    ln = F.length(nm)
    d1, d2 = F.col("d1"), F.col("d2")
    variant = (
        F.when((d1 == 0) & (d2 == 0), nm)
        .when(
            d1 == 0,
            F.concat(nm.substr(F.lit(1), d2 - 1), nm.substr(d2 + 1, ln - d2)),
        )
        .otherwise(
            F.concat(
                nm.substr(F.lit(1), d1 - 1),
                nm.substr(d1 + 1, d2 - d1 - 1),
                nm.substr(d2 + 1, ln - d2),
            )
        )
    )
    variants = (
        names.select(
            "brand",
            "name",
            F.explode(F.sequence(F.lit(0), ln)).alias("d1"),
        )
        .select(
            "brand",
            "name",
            "d1",
            F.explode(F.sequence(d1, F.length(nm))).alias("d2"),
        )
        .filter((d1 == 0) | (d2 > d1))
        .select("brand", "name", variant.alias("var"))
    )

    # Candidate distinct-name pairs sharing a variant within a brand;
    # exact banded-DP verification at threshold 2.
    va = variants.select("brand", F.col("name").alias("name_a"), "var")
    vb = variants.select("brand", F.col("name").alias("name_b"), "var")
    dist = F.levenshtein("name_a", "name_b", 2)
    name_pairs = (
        va.join(vb, ["brand", "var"])
        .filter(F.col("name_a") < F.col("name_b"))
        .select("brand", "name_a", "name_b")
        .distinct()
        .select("brand", "name_a", "name_b", dist.alias("edit_dist"))
        .filter(F.col("edit_dist") >= 0)
    )

    # Expand name pairs to key pairs (both orientations collapse via
    # least/greatest — each key combination appears exactly once).
    pa = part.select("brand", F.col("name").alias("name_a"), F.col("key").alias("ka"))
    pb = part.select("brand", F.col("name").alias("name_b"), F.col("key").alias("kb"))
    diff_name = name_pairs.join(pa, ["brand", "name_a"]).join(
        pb, ["brand", "name_b"]
    ).select(
        F.least("ka", "kb").alias("key_a"),
        F.greatest("ka", "kb").alias("key_b"),
        "edit_dist",
    )
    # Equal names (dist 0): self-join restricted to repeated names only.
    rep = part.join(
        names.filter(F.col("cnt") >= 2).select("brand", "name"), ["brand", "name"]
    )
    same_name = (
        rep.select("brand", "name", F.col("key").alias("key_a"))
        .join(rep.select("brand", "name", F.col("key").alias("key_b")), ["brand", "name"])
        .filter(F.col("key_a") < F.col("key_b"))
        .select("key_a", "key_b", F.lit(0).alias("edit_dist"))
    )
    return (
        diff_name.unionByName(same_name)
        .orderBy(F.asc("edit_dist"), F.asc("key_a"), F.asc("key_b"))
        .limit(50)
    )


# ---------------------------------------------------------------------------
# Event transition matrix (first-order Markov estimation)
# ---------------------------------------------------------------------------
@_register(
    "event_transition_matrix",
    "first-order Markov transition counts between consecutive events "
    "per user: lead() over (user, ts, event_id) with a unique tie-break "
    "-> hash agg on (from, to) -> exact transition probabilities as "
    "count ratios. One window shuffle + one tiny agg",
    """
    with seq as (
        select user_id, event_type as from_type,
               lead(event_type) over (
                   partition by user_id order by ts, event_id
               ) as to_type
        from events
    )
    select from_type, to_type,
           count(*) as n,
           round(count(*) * 1.0 / sum(count(*)) over (partition by from_type), 6)
               as p
    from seq
    where to_type is not null
    group by from_type, to_type
    """,
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = _spread(_t(spark, sf_dir, "events"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    counts = seq.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    w_tot = Window.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        "n",
        F.round(F.col("n") * 1.0 / F.sum("n").over(w_tot), 6).alias("p"),
    )


# ---------------------------------------------------------------------------
# TPC-H Q5 shape: 6-table snowflake join (region→nation→customer→orders→
# lineitem→supplier) with the "local supplier" nationkey equality —
# the planner stress the round-3 verdict asked for: mixed broadcast/SMJ,
# a non-key equality rider on the supplier join, agg over the join
# ---------------------------------------------------------------------------
@_register(
    "local_supplier_volume",
    "TPC-H Q5 shape: revenue by nation for orders where customer and "
    "supplier share the nation, within one region and order-date year. "
    "Tiny dims (region/nation/supplier) broadcast; orders⋈lineitem "
    "shuffles on orderkey under AQE; decimal-exact revenue",
    """
    select
        n.n_name,
        cast(count(*) as bigint)                  as n_lineitems,
        cast(sum(cast(l.l_extendedprice as decimal(18,2))
                 * (1 - cast(l.l_discount as decimal(18,2)))) as double)
                                                  as revenue
    from lineitem l
    join orders o   on l.l_orderkey = o.o_orderkey
    join customer c on o.o_custkey = c.c_custkey
    join supplier s on l.l_suppkey = s.s_suppkey
                   and c.c_nationkey = s.s_nationkey
    join nation n   on c.c_nationkey = n.n_nationkey
    join region r   on n.n_regionkey = r.r_regionkey
    where r.r_name = 'ASIA'
      and cast(o.o_orderdate as date) >= date '1996-01-01'
      and cast(o.o_orderdate as date) <  date '1997-01-01'
    group by n.n_name
    order by revenue desc, n.n_name asc
    """,
)
def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = _t(spark, sf_dir, "nation")
    # region⋈nation collapses to a handful of rows — broadcast it so the
    # customer scan prunes to in-region rows without a shuffle
    asia_nations = F.broadcast(
        nation.join(
            F.broadcast(region), nation.n_regionkey == region.r_regionkey
        ).select("n_nationkey", "n_name")
    )
    cust = (
        _t(spark, sf_dir, "customer")
        .join(asia_nations, F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", "c_nationkey", "n_name")
    )
    orders = _t(spark, sf_dir, "orders").filter(
        (F.to_date("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.to_date("o_orderdate") < F.lit("1997-01-01").cast("date"))
    )
    li = _spread(_t(spark, sf_dir, "lineitem"))
    supp = F.broadcast(
        _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    )
    revenue = (
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,2)")
            * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
        )
        .cast("double")
        .alias("revenue")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            supp,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lineitems"), revenue
        )
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q10 shape: returned-item revenue by customer over one quarter —
# fact⋈fact join with a selective flag filter, 4-way join, top-20
# ---------------------------------------------------------------------------
@_register(
    "returned_item_revenue",
    "TPC-H Q10 shape: revenue lost to returns (l_returnflag='R') per "
    "customer for one order quarter; customer⋈nation broadcast, "
    "orders⋈lineitem shuffle join, decimal-exact revenue, "
    "TakeOrderedAndProject top-20 with unique custkey tie-break",
    """
    select
        c.c_custkey,
        c.c_name,
        n.n_name,
        round(cast(c.c_acctbal as double), 2)     as acctbal,
        cast(sum(cast(l.l_extendedprice as decimal(18,2))
                 * (1 - cast(l.l_discount as decimal(18,2)))) as double)
                                                  as revenue
    from lineitem l
    join orders o   on l.l_orderkey = o.o_orderkey
    join customer c on o.o_custkey = c.c_custkey
    join nation n   on c.c_nationkey = n.n_nationkey
    where l.l_returnflag = 'R'
      and cast(o.o_orderdate as date) >= date '1996-07-01'
      and cast(o.o_orderdate as date) <  date '1996-10-01'
    group by c.c_custkey, c.c_name, n.n_name, round(cast(c.c_acctbal as double), 2)
    order by revenue desc, c.c_custkey asc
    limit 20
    """,
)
def returned_item_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _spread(_t(spark, sf_dir, "lineitem")).filter(
        F.col("l_returnflag") == "R"
    )
    orders = _t(spark, sf_dir, "orders").filter(
        (F.to_date("o_orderdate") >= F.lit("1996-07-01").cast("date"))
        & (F.to_date("o_orderdate") < F.lit("1996-10-01").cast("date"))
    )
    cust = _t(spark, sf_dir, "customer")
    nation = F.broadcast(_t(spark, sf_dir, "nation"))
    revenue = (
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,2)")
            * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
        )
        .cast("double")
        .alias("revenue")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(
            "c_custkey",
            "c_name",
            "n_name",
            F.round(F.col("c_acctbal").cast("double"), 2).alias("acctbal"),
        )
        .agg(revenue)
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# TPC-H Q18 shape: large-volume orders — semi-join against a HAVING
# aggregate of the fact table itself, then enrich with customer
# ---------------------------------------------------------------------------
@_register(
    "large_volume_orders",
    "TPC-H Q18 shape: orders whose total lineitem quantity exceeds 300 "
    "— self-aggregation of lineitem with HAVING, joined back to orders "
    "⋈ customer; decimal-exact quantity; top-100 by totalprice with "
    "orderkey tie-break",
    """
    with big as (
        select l_orderkey,
               cast(sum(cast(l_quantity as decimal(12,2))) as double) as sum_qty
        from lineitem
        group by l_orderkey
        having sum(cast(l_quantity as decimal(12,2))) > 300
    )
    select
        c.c_custkey,
        c.c_name,
        o.o_orderkey,
        cast(o.o_orderdate as date)                        as orderdate,
        round(cast(o.o_totalprice as double), 2)           as totalprice,
        b.sum_qty
    from big b
    join orders o   on b.l_orderkey = o.o_orderkey
    join customer c on o.o_custkey = c.c_custkey
    order by totalprice desc, o.o_orderkey asc
    limit 100
    """,
)
def large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _spread(_t(spark, sf_dir, "lineitem"))
    big = (
        li.groupBy("l_orderkey")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias("_q")
        )
        .filter(F.col("_q") > 300)
        .select(
            "l_orderkey", F.col("_q").cast("double").alias("sum_qty")
        )
    )
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.to_date("o_orderdate").alias("orderdate"),
            F.round(F.col("o_totalprice").cast("double"), 2).alias(
                "totalprice"
            ),
            "sum_qty",
        )
        .orderBy(F.desc("totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )
