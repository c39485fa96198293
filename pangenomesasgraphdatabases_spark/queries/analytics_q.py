"""Multi-dimensional aggregation + array-lateral operators.

Engine extensions (the reference has no grouping sets / cube / rollup,
SURVEY.md section 2.4 note) plus posexplode/exists coverage for the
array surface (F12 exists/any; A4 explode-with-position).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pangenomesasgraphdatabases_spark.data import table
from pangenomesasgraphdatabases_spark.queries.registry import register


@register(
    "cube_aggregation",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(l_quantity), 4) AS total_qty
    FROM lineitem
    GROUP BY CUBE(l_returnflag, l_linestatus)
    """,
    tags=("ext-olap", "cube"),
)
def cube_aggregation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus) — all 2^2 grouping sets in
    one pass (extension)."""
    li = table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_quantity"), 4).alias("total_qty"),
    )


@register(
    "rollup_aggregation",
    oracle="""
    SELECT o_orderpriority, o_orderstatus,
           CAST(count(*) AS BIGINT) AS n,
           round(avg(o_totalprice), 4) AS avg_price
    FROM orders
    GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
    """,
    tags=("ext-olap", "rollup"),
)
def rollup_aggregation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy (priority -> status -> grand total) (extension)."""
    o = table(spark, sf_dir, "orders")
    return o.rollup("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
    )


@register(
    "exists_any_predicate",
    oracle="""
    SELECT p_partkey,
           CAST(CASE WHEN len(list_filter(string_split(p_name, ' '),
                w -> length(w) >= 8)) > 0 THEN 1 ELSE 0 END AS INTEGER)
               AS has_long_word,
           CAST(CASE WHEN len(list_filter(string_split(p_name, ' '),
                w -> w = 'green')) > 0 THEN 1 ELSE 0 END AS INTEGER)
               AS has_green
    FROM part
    """,
    tags=("F12", "exists"),
)
def exists_any_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F12 `any(...)` / `exists` higher-order predicate
    (`any(node in nodes(path) where ...)`, RGPs.ipynb:466)."""
    p = table(spark, sf_dir, "part")
    words = F.split("p_name", " ")
    return p.select(
        "p_partkey",
        F.exists(words, lambda w: F.length(w) >= 8).cast("int").alias("has_long_word"),
        F.exists(words, lambda w: w == F.lit("green")).cast("int").alias("has_green"),
    )


@register(
    "posexplode_tokens",
    oracle="""
    SELECT p_partkey,
           CAST(i - 1 AS INTEGER) AS pos,
           string_split(p_type, ' ')[i] AS tok
    FROM part, generate_series(1, 8) t(i)
    WHERE i <= len(string_split(p_type, ' '))
    """,
    tags=("A4", "explode"),
)
def posexplode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode: lateral explode with element position — the
    UNWIND-with-ordinality shape used for path node lists (A4)."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey", F.posexplode(F.split("p_type", " ")).alias("pos", "tok")
    )


@register(
    "interval_sweep_concurrency",
    oracle="""
    WITH iv AS (
        SELECT least(CAST(epoch(o.o_orderdate) AS BIGINT) // 86400,
                     CAST(epoch(l.l_shipdate) AS BIGINT) // 86400) AS lo,
               greatest(CAST(epoch(o.o_orderdate) AS BIGINT) // 86400,
                        CAST(epoch(l.l_shipdate) AS BIGINT) // 86400) AS hi
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    deltas AS (
        SELECT lo AS day, CAST(1 AS BIGINT) AS delta FROM iv
        UNION ALL
        SELECT hi + 1 AS day, CAST(-1 AS BIGINT) AS delta FROM iv
    ),
    net AS (
        SELECT day, CAST(sum(delta) AS BIGINT) AS net_delta
        FROM deltas GROUP BY day
    )
    SELECT day, net_delta,
           CAST(sum(net_delta) OVER (ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS open_intervals
    FROM net
    """,
    tags=("ext-analytics", "interval", "sweep"),
)
def interval_sweep_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep-line interval concurrency (extension — the genomic
    coverage-depth / orders-in-flight operator): each lineitem defines
    an inclusive day interval spanning its order and ship dates (via
    least/greatest — the synthetic data orders the two dates both
    ways), and the result is the number of OPEN intervals on every day
    the count changes.  The classic sweep turns each interval into two
    boundary deltas (+1 at lo, -1 after hi), nets them per day, and
    takes a running sum over the day order — O(distinct days) output
    rows with NO per-position expansion, the same algebra that scales
    read-coverage depth over a 3 Gb genome or concurrent sessions over
    a year of traffic.

    Scale shape: the lineitem-orders join is a keyed shuffle join
    (bucketing co-locates it at deployment); the delta aggregation is
    map-side combinable into at most 2x distinct-days rows; the global
    running sum uses operators/prefix.global_cumsum — range partition
    + per-partition window + broadcast partition offsets — NOT a
    single-partition Window.orderBy, so the sweep stays distributed at
    any day range."""
    from pangenomesasgraphdatabases_spark.operators.prefix import global_cumsum

    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    day = lambda c: F.expr(f"CAST(unix_timestamp({c}) AS BIGINT) div 86400")
    iv = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.least(day("o_orderdate"), day("l_shipdate")).alias("lo"),
        F.greatest(day("o_orderdate"), day("l_shipdate")).alias("hi"),
    )
    deltas = iv.select(F.col("lo").alias("day"), F.lit(1).alias("delta")).unionByName(
        iv.select((F.col("hi") + 1).alias("day"), F.lit(-1).alias("delta"))
    )
    net = deltas.groupBy("day").agg(F.sum("delta").cast("bigint").alias("net_delta"))
    return global_cumsum(net, ["day"], "net_delta", "open_intervals").select(
        "day", "net_delta", F.col("open_intervals").cast("bigint").alias("open_intervals")
    )


@register(
    "order_basket_pairs",
    oracle="""
    WITH d AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    freq AS (
        SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_orders_part
        FROM d GROUP BY l_partkey
    ),
    n AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders FROM d),
    pairs AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               CAST(count(*) AS BIGINT) AS support
        FROM d a JOIN d b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
        HAVING count(*) >= 2
    )
    SELECT p.part_a, p.part_b, p.support,
           fa.n_orders_part AS freq_a, fb.n_orders_part AS freq_b,
           CAST(p.support * 1000000 // fa.n_orders_part AS BIGINT)
               AS conf_a_to_b_micro,
           CAST(p.support * n.n_orders * 1000000
                // (fa.n_orders_part * fb.n_orders_part) AS BIGINT)
               AS lift_micro
    FROM pairs p
    JOIN freq fa ON p.part_a = fa.l_partkey
    JOIN freq fb ON p.part_b = fb.l_partkey
    CROSS JOIN n
    """,
    tags=("ext-analytics", "basket", "cooccurrence"),
)
def order_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket pair mining (extension — the co-occurrence /
    frequent-itemset operator of recommendation and data-curation
    pipelines): part pairs appearing in the same order, with support,
    per-item frequencies, directed confidence, and lift — confidence
    and lift in exact fixed-point micros (integer multiply before
    integer divide), so no float ratio ever crosses engines.

    Scale shape (r15, guide §2.4 — the canonical_pair_dedup r5 lesson
    applied here): pair expansion is per-row ARRAY SURGERY over each
    order's sorted distinct part set (one groupBy(l_orderkey) with
    collect_set replaces the former distinct + two-sided self-join —
    four executions of the distinct exchange plus a sort-merge join
    became three executions of one basket groupBy).  Cost is sum over
    baskets of |basket|^2 as before, bounded by the max basket
    (13 parts here; a pathological mega-basket is the skew watch item,
    capped in production by a basket-size filter).  The pair
    aggregation shuffles on (part_a, part_b); the frequency table is
    an explode of the same basket arrays; the order count is one
    scalar broadcast.  The support >= 2 floor prunes the singleton
    long tail before the frequency joins — the same docfreq-pruning
    idea as the n-gram dedup index.  Sorted positions i<j over the
    DISTINCT set replicate the a.part < b.part self-join over
    distinct rows exactly."""
    from pangenomesasgraphdatabases_spark.operators.skew import (
        capped_pair_rows,
    )

    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    ps = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("ps")
    )
    # r16 skew guard (VERDICT r15 #3, guide §2.5): a mega-basket's
    # in-row |ps|^2/2 pair array is capped — capped_pair_rows expands
    # chunk-by-chunk so no single flatten exceeds cap^2 structs.
    pairs = (
        capped_pair_rows(ps, "ps")
        .select(F.col("lo").alias("part_a"), F.col("hi").alias("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= 2)
    )
    freq = (
        ps.select(F.explode("ps").alias("l_partkey"))
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("n_orders_part"))
    )
    n = ps.agg(F.count(F.lit(1)).alias("n_orders"))
    fa = freq.select(
        F.col("l_partkey").alias("part_a"), F.col("n_orders_part").alias("freq_a")
    )
    fb = freq.select(
        F.col("l_partkey").alias("part_b"), F.col("n_orders_part").alias("freq_b")
    )
    return (
        pairs.join(fa, "part_a")
        .join(fb, "part_b")
        .crossJoin(F.broadcast(n))
        .select(
            "part_a",
            "part_b",
            "support",
            "freq_a",
            "freq_b",
            F.expr("support * 1000000 div freq_a")
            .cast("bigint")
            .alias("conf_a_to_b_micro"),
            F.expr("support * n_orders * 1000000 div (freq_a * freq_b)")
            .cast("bigint")
            .alias("lift_micro"),
        )
    )


@register(
    "customer_rfm_segments",
    oracle="""
    WITH rfm AS (
        SELECT o_custkey,
               CAST(max(epoch(o_orderdate)) AS BIGINT) AS last_order_es,
               CAST(count(*) AS BIGINT) AS frequency,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS monetary_cents
        FROM orders GROUP BY o_custkey
    )
    SELECT o_custkey, last_order_es, frequency, monetary_cents,
           CAST(ntile(5) OVER (ORDER BY last_order_es, o_custkey) AS BIGINT)
               AS r_score,
           CAST(ntile(5) OVER (ORDER BY frequency, o_custkey) AS BIGINT)
               AS f_score,
           CAST(ntile(5) OVER (ORDER BY monetary_cents, o_custkey) AS BIGINT)
               AS m_score
    FROM rfm
    """,
    tags=("ext-analytics", "rfm", "segmentation"),
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation (extension — the classic
    recency/frequency/monetary scoring): per customer, last order
    time, order count, and lifetime cents, each scored into ntile(5)
    quintiles with a deterministic (value, custkey) total order so
    both engines assign identical buckets.  Higher = more recent /
    frequent / valuable.

    Scale shape: one groupBy on custkey, then three ntile windows.
    The windows are GLOBAL orderings — the honest cost of exact
    quintiles; at 100 TB you swap ntile for thresholds from
    `events_quantile_histogram`'s sketch (score = bucket lookup,
    map-only) and keep this exact form as the auditable spec.  The
    customer aggregate frame (one row per customer) is already ~1000x
    smaller than orders."""
    o = table(spark, sf_dir, "orders")
    rfm = o.groupBy("o_custkey").agg(
        F.max(F.unix_timestamp("o_orderdate")).cast("bigint").alias("last_order_es"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("monetary_cents"),
    )
    w_r = Window.orderBy("last_order_es", "o_custkey")
    w_f = Window.orderBy("frequency", "o_custkey")
    w_m = Window.orderBy("monetary_cents", "o_custkey")
    return rfm.select(
        "o_custkey",
        "last_order_es",
        "frequency",
        "monetary_cents",
        F.ntile(5).over(w_r).cast("bigint").alias("r_score"),
        F.ntile(5).over(w_f).cast("bigint").alias("f_score"),
        F.ntile(5).over(w_m).cast("bigint").alias("m_score"),
    )


@register(
    "orders_ols_trend",
    oracle="""
    WITH pts AS (
        SELECT o_orderpriority,
               CAST(epoch(o_orderdate) AS BIGINT) // 86400
                   - (SELECT min(CAST(epoch(o_orderdate) AS BIGINT) // 86400)
                      FROM orders) AS x,
               CAST(round(o_totalprice) AS BIGINT) AS y
        FROM orders
    ),
    acc AS (
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx,
               CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x * y) AS BIGINT) AS sxy,
               CAST(sum(x * x) AS BIGINT) AS sxx
        FROM pts GROUP BY o_orderpriority
    )
    SELECT o_orderpriority, n, sx, sy, sxy, sxx,
           CAST((n * sxy - sx * sy) // (n * sxx - sx * sx) * 1000
                + ((n * sxy - sx * sy) % (n * sxx - sx * sx)) * 1000
                  // (n * sxx - sx * sx) AS BIGINT) AS slope_milli
    FROM acc
    """,
    tags=("ext-analytics", "regression", "ols"),
)
def orders_ols_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distributed ordinary-least-squares trend per order
    priority (extension — the per-group regression a metrics pipeline
    fits without collecting points): slope of order value (whole
    currency units) over days since the first order, from the five
    classic accumulators (n, Σx, Σy, Σxy, Σx²) — each an exact
    integer sum, so the fit is order-independent and identical on
    both engines.  The slope emits in exact milli-units via STAGED
    integer division (quotient*1000 + remainder*1000 div denominator)
    because numerator × 1000 would overflow int64 at this data scale
    — the standard fixed-point trick for high-magnitude exact
    ratios.

    Scale shape: one map-side-combinable aggregation; the global min
    day is one scalar subquery (broadcast).  Accumulators merge by
    addition across shards — the same rollup algebra as the
    incremental pipeline, so the fit maintains incrementally too."""
    o = table(spark, sf_dir, "orders")
    day = F.expr("CAST(unix_timestamp(o_orderdate) AS BIGINT) div 86400")
    min_day = o.agg(F.min(day).alias("d0"))
    pts = o.crossJoin(F.broadcast(min_day)).select(
        "o_orderpriority",
        (day - F.col("d0")).alias("x"),
        F.round("o_totalprice").cast("bigint").alias("y"),
    )
    acc = pts.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
    )
    return acc.select(
        "o_orderpriority",
        "n",
        "sx",
        "sy",
        "sxy",
        "sxx",
        F.expr(
            "CAST((n * sxy - sx * sy) div (n * sxx - sx * sx) * 1000"
            " + ((n * sxy - sx * sy) % (n * sxx - sx * sx)) * 1000"
            "   div (n * sxx - sx * sx) AS BIGINT)"
        ).alias("slope_milli"),
    )


@register(
    "gene_accumulation_curve",
    oracle="""
    WITH pres AS (
        SELECT DISTINCT l_suppkey AS sk, l_partkey AS gene FROM lineitem
    ),
    firsts AS (SELECT gene, min(sk) AS sk FROM pres GROUP BY gene),
    newg AS (
        SELECT sk, CAST(count(*) AS BIGINT) AS new_genes
        FROM firsts GROUP BY sk
    ),
    base AS (
        SELECT s.sk, CAST(coalesce(n.new_genes, 0) AS BIGINT) AS new_genes
        FROM (SELECT DISTINCT sk FROM pres) s
        LEFT JOIN newg n ON s.sk = n.sk
    )
    SELECT CAST(row_number() OVER (ORDER BY sk) AS BIGINT) AS strain_rank,
           sk AS suppkey,
           new_genes,
           CAST(sum(new_genes) OVER (ORDER BY sk
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS pangenome_size
    FROM base
    """,
    tags=("ext-domain", "pangenome", "heaps"),
)
def gene_accumulation_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pangenome gene-accumulation (openness / Heaps-law) curve — THE
    summary statistic of pangenomics (Tettelin 2005; the reference's
    core/accessory split in PIRATE.ipynb is one point of this curve):
    add strains in a deterministic order and report how many NEW gene
    clusters each strain contributes and the cumulative pangenome
    size.  Star-schema isomorph: strain = supplier, gene cluster =
    part, presence = the supplier shipped that part.

    The naive formulation re-scans presence per prefix (quadratic);
    this one is linear: each gene's FIRST strain (min over the strain
    order) is the only place it increments the curve, so the whole
    curve is one groupBy(min) + one per-strain count + a running sum.

    Scale shape: presence distinct + first-strain groupBy shuffle on
    gene; the per-strain frame is #strains rows; the running sums use
    operators/prefix.global_cumsum (range partition + broadcast
    offsets), never a single-partition data-sized window — at 1e6
    strains the curve stays distributed end-to-end."""
    from pangenomesasgraphdatabases_spark.operators.prefix import global_cumsum

    li = table(spark, sf_dir, "lineitem")
    pres = li.select(
        F.col("l_suppkey").alias("sk"), F.col("l_partkey").alias("gene")
    ).distinct()
    firsts = pres.groupBy("gene").agg(F.min("sk").alias("sk"))
    newg = firsts.groupBy("sk").agg(F.count(F.lit(1)).alias("new_genes"))
    base = (
        pres.select("sk")
        .distinct()
        .join(newg, "sk", "left")
        .select(
            "sk",
            F.coalesce("new_genes", F.lit(0)).cast("bigint").alias("new_genes"),
            F.lit(1).cast("bigint").alias("one"),
        )
    )
    curve = global_cumsum(base, ["sk"], "new_genes", "pangenome_size")
    ranked = global_cumsum(curve, ["sk"], "one", "strain_rank")
    return ranked.select(
        F.col("strain_rank").cast("bigint").alias("strain_rank"),
        F.col("sk").alias("suppkey"),
        "new_genes",
        F.col("pangenome_size").cast("bigint").alias("pangenome_size"),
    )


@register(
    "part_skyline_pareto",
    oracle="""
    WITH pts AS (
        SELECT p_size,
               CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents
        FROM part
    ),
    best AS (
        SELECT p_size, min(price_cents) AS best_price_cents
        FROM pts GROUP BY p_size
    ),
    sky AS (
        SELECT p_size, best_price_cents,
               min(best_price_cents) OVER (ORDER BY p_size DESC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS better_above
        FROM best
    )
    SELECT p_size, best_price_cents
    FROM sky
    WHERE better_above IS NULL OR best_price_cents < better_above
    """,
    tags=("ext-analytics", "skyline", "pareto"),
)
def part_skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline (Pareto-frontier) operator — maximize p_size, minimize
    price (extension; the multi-objective shortlist of catalog /
    model-selection pipelines).  A point survives iff NO other point
    is at least as large AND strictly cheaper (or larger at the same
    price).  The quadratic NOT-EXISTS definition collapses to a sort
    + prefix-min: group to the best (min) price per size, order sizes
    descending, and keep a size iff its best price beats the running
    min over all strictly larger sizes.

    Scale shape: one shuffle for the per-size min (map-side
    combinable); the window runs over the #distinct-sizes frame (50
    here, bounded by the attribute domain, not the data) — for an
    unbounded domain the prefix-min swaps onto
    operators/prefix.global_cumsum's range-partitioned formulation."""
    p = table(spark, sf_dir, "part")
    best = (
        p.select(
            "p_size",
            F.round(F.col("p_retailprice") * 100).cast("bigint").alias("price_cents"),
        )
        .groupBy("p_size")
        .agg(F.min("price_cents").alias("best_price_cents"))
    )
    w = Window.orderBy(F.desc("p_size")).rowsBetween(Window.unboundedPreceding, -1)
    sky = best.withColumn("better_above", F.min("best_price_cents").over(w))
    return sky.filter(
        F.col("better_above").isNull()
        | (F.col("best_price_cents") < F.col("better_above"))
    ).select("p_size", "best_price_cents")


@register(
    "orders_pareto_abc",
    oracle="""
    WITH rev AS (
        SELECT o_custkey,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM orders GROUP BY o_custkey
    ),
    tot AS (SELECT CAST(sum(cents) AS BIGINT) AS total_cents FROM rev),
    cum AS (
        SELECT o_custkey, cents,
               CAST(sum(cents) OVER (ORDER BY cents DESC, o_custkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cum_cents
        FROM rev
    )
    SELECT c.o_custkey, c.cents,
           CAST(c.cum_cents * 1000000 // t.total_cents AS BIGINT)
               AS cum_share_micro,
           CASE WHEN c.cum_cents * 1000000 // t.total_cents <= 800000
                THEN 'A'
                WHEN c.cum_cents * 1000000 // t.total_cents <= 950000
                THEN 'B' ELSE 'C' END AS abc_class
    FROM cum c CROSS JOIN tot t
    """,
    tags=("ext-analytics", "pareto", "abc"),
)
def orders_pareto_abc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto classification (extension — the 80/15/5 revenue
    concentration report): customers ranked by lifetime revenue, the
    running share of total revenue in exact integer micros, and class
    A (first 80% of revenue), B (to 95%), C (tail).  Ties on revenue
    break by custkey so the global order — and therefore every
    class boundary — is identical across engines.

    Scale shape: the per-customer rollup is one map-side-combinable
    shuffle; the descending running sum uses
    operators/prefix.global_cumsum over (-cents, custkey) — range
    partition + broadcast offsets, no single-partition window over
    the customer frame; the grand total is one scalar broadcast."""
    from pangenomesasgraphdatabases_spark.operators.prefix import global_cumsum

    o = table(spark, sf_dir, "orders")
    rev = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    tot = rev.agg(F.sum("cents").cast("bigint").alias("total_cents"))
    ranked = rev.withColumn("neg_cents", -F.col("cents"))
    cum = global_cumsum(ranked, ["neg_cents", "o_custkey"], "cents", "cum_cents")
    share = F.expr("CAST(cum_cents * 1000000 div total_cents AS BIGINT)")
    return (
        cum.crossJoin(F.broadcast(tot))
        .select(
            "o_custkey",
            "cents",
            share.alias("cum_share_micro"),
            F.when(share <= 800000, "A")
            .when(share <= 950000, "B")
            .otherwise("C")
            .alias("abc_class"),
        )
    )


@register(
    "lineitem_weighted_median",
    oracle="""
    WITH pts AS (
        SELECT l_returnflag,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS price_cents,
               CAST(round(l_quantity) AS BIGINT) AS w
        FROM lineitem
    ),
    hist AS (
        SELECT l_returnflag, price_cents, CAST(sum(w) AS BIGINT) AS w
        FROM pts GROUP BY 1, 2
    ),
    cum AS (
        SELECT l_returnflag, price_cents, w,
               CAST(sum(w) OVER (PARTITION BY l_returnflag
                    ORDER BY price_cents
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cw,
               CAST(sum(w) OVER (PARTITION BY l_returnflag) AS BIGINT) AS tw
        FROM hist
    )
    SELECT l_returnflag,
           CAST(min(price_cents) AS BIGINT) AS weighted_median_cents,
           CAST(min(tw) AS BIGINT) AS total_weight
    FROM cum
    WHERE 2 * cw >= tw
    GROUP BY l_returnflag
    """,
    tags=("ext-analytics", "weighted-median"),
)
def lineitem_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT weighted median per group — smallest price whose
    cumulative quantity-weight reaches half the group's total
    (extension; the robust location estimate percentile_approx only
    approximates).  Pre-aggregating to the (group, price) histogram
    FIRST means the cumulative window runs over the distinct-price
    frame — bounded by the value domain, not the row count — the same
    two-level trick as events_exact_median_2pass, all in exact
    integer cents/units.

    Scale shape: one map-side-combinable shuffle to the histogram;
    the per-group window orders <= |price domain| rows per group; no
    full-data window, no collect."""
    li = table(spark, sf_dir, "lineitem")
    hist = (
        li.select(
            "l_returnflag",
            F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("price_cents"),
            F.round("l_quantity").cast("bigint").alias("w"),
        )
        .groupBy("l_returnflag", "price_cents")
        .agg(F.sum("w").alias("w"))
    )
    w_cum = (
        Window.partitionBy("l_returnflag")
        .orderBy("price_cents")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_tot = Window.partitionBy("l_returnflag")
    cum = hist.select(
        "l_returnflag",
        "price_cents",
        F.sum("w").over(w_cum).cast("bigint").alias("cw"),
        F.sum("w").over(w_tot).cast("bigint").alias("tw"),
    )
    return (
        cum.filter(2 * F.col("cw") >= F.col("tw"))
        .groupBy("l_returnflag")
        .agg(
            F.min("price_cents").cast("bigint").alias("weighted_median_cents"),
            F.min("tw").cast("bigint").alias("total_weight"),
        )
    )


@register(
    "orders_cohort_ltv",
    oracle="""
    WITH om AS (
        SELECT o_custkey,
               CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1
                    AS BIGINT) AS midx,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    ),
    cohort AS (
        SELECT o_custkey, CAST(min(midx) AS BIGINT) AS cohort_midx
        FROM om GROUP BY o_custkey
    )
    SELECT c.cohort_midx, CAST(o.midx - c.cohort_midx AS BIGINT) AS age_months,
           CAST(count(DISTINCT o.o_custkey) AS BIGINT) AS n_customers,
           CAST(sum(o.cents) AS BIGINT) AS total_cents
    FROM om o JOIN cohort c ON o.o_custkey = c.o_custkey
    GROUP BY 1, 2
    """,
    tags=("ext-analytics", "cohort", "ltv"),
)
def orders_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value matrix (extension — the acquisition-month
    x account-age revenue triangle): customers cohorted by first-order
    month, revenue rolled up by months-since-acquisition.  Month
    index = year*12 + month - 1 (pure integer calendar arithmetic, no
    date diff ambiguity), revenue in exact cents.  Complements
    events_retention_cohorts (activity retention) with the REVENUE
    dimension.

    Scale shape: cohort assignment is a groupBy(min) on custkey; the
    matrix rollup joins orders to the customer-sized cohort frame on
    the same key (broadcast at dimension scale) and shuffles once on
    (cohort, age) — both keys bounded by the calendar, so the output
    is months^2/2 rows regardless of data size."""
    o = table(spark, sf_dir, "orders")
    om = o.select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1)
        .cast("bigint")
        .alias("midx"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    cohort = om.groupBy("o_custkey").agg(
        F.min("midx").cast("bigint").alias("cohort_midx")
    )
    return (
        om.join(cohort, "o_custkey")
        .groupBy(
            "cohort_midx",
            (F.col("midx") - F.col("cohort_midx")).cast("bigint").alias("age_months"),
        )
        .agg(
            F.count_distinct("o_custkey").cast("bigint").alias("n_customers"),
            F.sum("cents").cast("bigint").alias("total_cents"),
        )
    )


@register(
    "orders_snaive_backtest_mae",
    oracle="""
    WITH m AS (
        SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1
                    AS BIGINT) AS midx,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders GROUP BY 1
    )
    SELECT a.midx,
           a.cents AS actual_cents,
           f.cents AS forecast_cents,
           CAST(abs(a.cents - f.cents) AS BIGINT) AS abs_err_cents,
           CAST(abs(a.cents - f.cents) * 1000000 // a.cents AS BIGINT)
               AS ape_ppm
    FROM m a JOIN m f ON f.midx = a.midx - 12
    """,
    tags=("ext-analytics", "forecast", "backtest"),
)
def orders_snaive_backtest_mae(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast backtest (extension — the baseline every
    forecasting system must beat, evaluated the way a forecasting
    system is evaluated: walk forward and score): each month's revenue
    forecast is the SAME month one year earlier (a self-join on
    midx-12), scored by absolute error and absolute percentage error
    in exact integer cents / ppm.  Months without a prior year drop
    out of the join — the honest backtest window.

    Scale shape: one map-side-combinable rollup to the month frame
    (calendar-bounded), then a self-join on that tiny frame.  The
    pattern generalizes: swap the lag-12 join key for any
    champion/challenger forecast table."""
    o = table(spark, sf_dir, "orders")
    m = o.groupBy(
        (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1)
        .cast("bigint")
        .alias("midx")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    a = m.select(F.col("midx"), F.col("cents").alias("actual_cents"))
    f = m.select(
        (F.col("midx") + 12).alias("midx"), F.col("cents").alias("forecast_cents")
    )
    return a.join(f, "midx").select(
        "midx",
        "actual_cents",
        "forecast_cents",
        F.abs(F.col("actual_cents") - F.col("forecast_cents"))
        .cast("bigint")
        .alias("abs_err_cents"),
        F.expr(
            "abs(actual_cents - forecast_cents) * 1000000L div actual_cents"
        )
        .cast("bigint")
        .alias("ape_ppm"),
    )


@register(
    "lineitem_join_cardinality_est",
    oracle="""
    WITH h AS (
        SELECT l_partkey, CAST(count(*) AS BIGINT) AS c
        FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(c) AS BIGINT) AS n_rows,
           CAST(sum(c * c) AS BIGINT) AS est_selfjoin_rows,
           CAST(max(c) AS BIGINT) AS max_key_freq,
           CAST(sum(c * c) // sum(c) AS BIGINT) AS avg_fanout
    FROM h
    """,
    tags=("ext-olap", "cbo-stats", "cardinality"),
)
def lineitem_join_cardinality_est(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality estimation from key histograms (extension —
    the statistic a cost-based optimizer needs before picking a join
    strategy, computed the way ANALYZE TABLE would): the self-
    equi-join output size on l_partkey is EXACTLY sum(c^2) over the
    key-frequency histogram; max_key_freq is the skew headline (the
    key a salting decision reads), and avg_fanout = sum(c^2)/sum(c)
    is the expected per-row match count.  All exact integers — this
    estimator is not an estimate for the self-join case, which is
    what makes it driver-hashable.

    Scale shape: one map-side-combinable count per key, one scalar
    rollup over the histogram.  At 100 TB this IS the stats-collection
    pass; its output decides broadcast vs shuffle vs salted plans."""
    li = table(spark, sf_dir, "lineitem")
    h = li.groupBy("l_partkey").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    return h.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.sum("c").cast("bigint").alias("n_rows"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("est_selfjoin_rows"),
        F.max("c").cast("bigint").alias("max_key_freq"),
        F.expr("sum(c * c) div sum(c)").cast("bigint").alias("avg_fanout"),
    )


# Grouped-OLS slope fragment from exact integer accumulators — one
# text, both engines (the staged-division idiom of orders_ols_trend).
_ELAST_SLOPE_SQL = (
    "((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)"
    " / nullif(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx, 0.0))"
)


@register(
    "lineitem_discount_elasticity",
    oracle=f"""
    WITH pts AS (
        SELECT p.p_brand,
               CAST(round(l.l_discount * 100) AS BIGINT) AS disc_pct,
               CAST(round(l.l_quantity) AS BIGINT) AS qty
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    acc AS (
        SELECT p_brand,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(disc_pct) AS BIGINT) AS sx,
               CAST(sum(qty) AS BIGINT) AS sy,
               CAST(sum(disc_pct * disc_pct) AS BIGINT) AS sxx,
               CAST(sum(disc_pct * qty) AS BIGINT) AS sxy
        FROM pts GROUP BY p_brand
    )
    SELECT p_brand, n, sx, sy,
           CAST(round({_ELAST_SLOPE_SQL} * 1000000) AS BIGINT)
               AS slope_micro_qty_per_pct
    FROM acc
    """,
    tags=("ext-analytics", "grouped-ols", "elasticity"),
)
def lineitem_discount_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand discount elasticity via grouped OLS (extension — the
    pricing question asked per segment, not globally: does a deeper
    discount move quantity for THIS brand?): slope of quantity on
    discount percentage fitted independently per brand, all
    accumulators exact integers (discount quantized to whole percent,
    quantity to units), the slope one correctly-rounded shared
    expression reported in micro units.  The grouped twin of
    orders_ols_trend: same moments, one regression per key.

    Scale shape: one map-side-combinable shuffle to the per-brand
    moment frame (5 integers per brand — constant state regardless of
    rows); the slope arithmetic runs on |brands| rows.  This is the
    massively-parallel regression shape: a million independent OLS
    fits cost one aggregation."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    pts = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select(
        "p_brand",
        F.round(F.col("l_discount") * 100).cast("bigint").alias("disc_pct"),
        F.round("l_quantity").cast("bigint").alias("qty"),
    )
    acc = pts.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("disc_pct").cast("bigint").alias("sx"),
        F.sum("qty").cast("bigint").alias("sy"),
        F.sum(F.col("disc_pct") * F.col("disc_pct")).cast("bigint").alias("sxx"),
        F.sum(F.col("disc_pct") * F.col("qty")).cast("bigint").alias("sxy"),
    )
    return acc.select(
        "p_brand",
        "n",
        "sx",
        "sy",
        F.round(F.expr(_ELAST_SLOPE_SQL) * 1000000)
        .cast("bigint")
        .alias("slope_micro_qty_per_pct"),
    )


@register(
    "lineitem_equidepth_histogram",
    oracle="""
    WITH h AS (
        SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
               CAST(count(*) AS BIGINT) AS c
        FROM lineitem GROUP BY 1
    ),
    cum AS (
        SELECT cents, c,
               CAST(sum(c) OVER (ORDER BY cents
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cw,
               CAST(sum(c) OVER () AS BIGINT) AS n
        FROM h
    ),
    b AS (SELECT unnest([1, 2, 3, 4, 5, 6, 7, 8]) AS bucket)
    SELECT b.bucket,
           CAST(min(c.cents) AS BIGINT) AS upper_bound_cents,
           CAST(min(c.cw) AS BIGINT) AS cum_rows,
           CAST(min(c.n) AS BIGINT) AS n_rows
    FROM b JOIN cum c ON c.cw * 8 >= c.n * b.bucket
    GROUP BY b.bucket
    """,
    tags=("ext-analytics", "cbo-stats", "equi-depth"),
)
def lineitem_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth histogram boundaries (extension — the OTHER half of
    optimizer statistics next to lineitem_join_cardinality_est: 8
    bucket upper bounds of l_extendedprice such that each bucket
    holds ~n/8 rows, which is what range-predicate selectivity
    estimation reads): the k-th boundary is the smallest value whose
    cumulative count reaches k*n/8, located by the exact integer
    comparison cw*8 >= n*k on the value-count histogram — the
    two-level trick again, so the cumulative window orders DISTINCT
    values, never raw rows.

    Scale shape: one map-side-combinable value-count shuffle; the
    (single-partition) cumulative window runs over the distinct
    cent-value frame, bounded by the price domain — at wider domains
    pre-bucket to a fixed grid first (events_quantile_histogram) or
    range-partition the cumsum (operators/prefix.global_cumsum)."""
    li = table(spark, sf_dir, "lineitem")
    h = li.groupBy(
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("cents")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    cum = h.select(
        "cents",
        F.sum("c")
        .over(Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, 0))
        .cast("bigint")
        .alias("cw"),
        F.sum("c").over(Window.partitionBy()).cast("bigint").alias("n"),
    )
    b = spark.createDataFrame([(i,) for i in range(1, 9)], "bucket int")
    return (
        F.broadcast(b)
        .join(cum, F.col("cw") * 8 >= F.col("n") * F.col("bucket"))
        .groupBy("bucket")
        .agg(
            F.min("cents").cast("bigint").alias("upper_bound_cents"),
            F.min("cw").cast("bigint").alias("cum_rows"),
            F.min("n").cast("bigint").alias("n_rows"),
        )
    )


@register(
    "part_revenue_gini",
    oracle="""
    WITH rev AS (
        SELECT l_partkey,
               CAST(sum(CAST(round(l_extendedprice
                    * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM lineitem GROUP BY l_partkey
    ),
    ranked AS (
        SELECT cents,
               row_number() OVER (ORDER BY cents, l_partkey) AS rk
        FROM rev
    ),
    acc AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(cents) AS BIGINT) AS s,
               CAST(sum(rk * cents) AS BIGINT) AS srw
        FROM ranked
    )
    SELECT n, s,
           CAST(round((2.0 * srw / (CAST(n AS DOUBLE) * s)
                - (CAST(n AS DOUBLE) + 1.0) / n) * 1000000) AS BIGINT)
               AS gini_micro
    FROM acc
    """,
    tags=("ext-analytics", "gini", "concentration"),
)
def part_revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of revenue concentration across parts
    (extension — the single-number inequality summary next to the
    Pareto/ABC curve: 0 = revenue spread evenly, 1 = one part takes
    all): the rank-weighted formula G = 2*sum(i*x_i)/(n*sum(x)) -
    (n+1)/n over revenue sorted ascending, ranks tie-broken on
    partkey so both engines weight identically.  All accumulators
    exact integer cents; the final G is one correctly-rounded double
    expression reported in micro units.

    Scale shape: per-part revenue is one map-side-combinable shuffle;
    the rank window runs over the part-level frame (dimension-sized,
    not fact-sized); the reduction is a 3-integer scalar.  For a
    fact-sized population the rank would ride
    operators/prefix.global_cumsum instead of one window."""
    li = table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.sum(
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
            .cast("bigint")
        )
        .cast("bigint")
        .alias("cents")
    )
    ranked = rev.select(
        "cents",
        F.row_number().over(Window.orderBy("cents", "l_partkey")).alias("rk"),
    )
    acc = ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("s"),
        F.sum(F.col("rk") * F.col("cents")).cast("bigint").alias("srw"),
    )
    return acc.select(
        "n",
        "s",
        F.round(
            (
                2.0 * F.col("srw") / (F.col("n").cast("double") * F.col("s"))
                - (F.col("n").cast("double") + 1.0) / F.col("n")
            )
            * 1000000
        )
        .cast("bigint")
        .alias("gini_micro"),
    )


_KM_HORIZON_DAYS = 90


@register(
    "customer_km_survival",
    oracle=f"""
    WITH life AS (
        SELECT o_custkey,
               CAST(max(epoch(o_orderdate)) // 86400
                    - min(epoch(o_orderdate)) // 86400 AS BIGINT) AS t,
               CAST(max(epoch(o_orderdate)) // 86400 AS BIGINT) AS last_day
        FROM orders GROUP BY o_custkey
    ),
    horizon AS (
        SELECT CAST(max(last_day) AS BIGINT) AS max_day FROM life
    ),
    marked AS (
        SELECT l.t,
               CASE WHEN h.max_day - l.last_day < {_KM_HORIZON_DAYS}
                    THEN 1 ELSE 0 END AS censored
        FROM life l CROSS JOIN horizon h
    ),
    rt AS (
        SELECT t,
               CAST(sum(1 - censored) AS BIGINT) AS d_events,
               CAST(sum(censored) AS BIGINT) AS c_censored
        FROM marked GROUP BY t
    ),
    risk AS (
        SELECT t, d_events, c_censored,
               CAST(sum(d_events + c_censored) OVER (ORDER BY t DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS n_risk
        FROM rt
    ),
    contrib AS (
        SELECT t, d_events, c_censored, n_risk,
               CASE WHEN d_events > 0 AND d_events < n_risk
                    THEN CAST(round(ln(1.0 - CAST(d_events AS DOUBLE)
                         / n_risk) * 10000) AS BIGINT)
                    ELSE 0 END AS ln_e4
        FROM risk
    )
    SELECT t AS t_days, n_risk, d_events, c_censored,
           CAST(sum(ln_e4) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS survival_ln_e4,
           d_events = n_risk AS absorbs_all
    FROM contrib
    """,
    tags=("ext-analytics", "survival", "kaplan-meier"),
)
def customer_km_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier customer-lifetime survival curve (extension — the
    churn-analysis standard with proper right-censoring: customers
    whose last order falls within {h} days of the dataset's end are
    censored, not churned): lifetime in epoch days, the risk table
    over DISTINCT lifetimes (reverse cumulative at-risk counts), and
    the product-limit estimator carried in exact 1e-4 log units —
    each hazard's ln(1 - d/n) quantized per event time, the curve a
    running integer sum (the entropy idiom applied to survival; the
    caller exponentiates for S(t)).  Times where every remaining
    customer exits get `absorbs_all` instead of ln(0).

    Scale shape: lifetimes are one groupBy per customer; everything
    after runs on the DISTINCT-lifetime frame (calendar-bounded),
    including both cumulative windows.  The scalar horizon
    broadcasts."""
    o = table(spark, sf_dir, "orders")
    day = F.expr("CAST(unix_timestamp(o_orderdate) AS BIGINT) div 86400")
    life = o.groupBy("o_custkey").agg(
        (F.max(day) - F.min(day)).cast("bigint").alias("t"),
        F.max(day).cast("bigint").alias("last_day"),
    )
    horizon = life.agg(F.max("last_day").cast("bigint").alias("max_day"))
    marked = life.crossJoin(F.broadcast(horizon)).select(
        "t",
        F.when(
            F.col("max_day") - F.col("last_day") < _KM_HORIZON_DAYS, 1
        )
        .otherwise(0)
        .alias("censored"),
    )
    rt = marked.groupBy("t").agg(
        F.sum(1 - F.col("censored")).cast("bigint").alias("d_events"),
        F.sum("censored").cast("bigint").alias("c_censored"),
    )
    w_desc = Window.orderBy(F.desc("t")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    risk = rt.withColumn(
        "n_risk",
        F.sum(F.col("d_events") + F.col("c_censored"))
        .over(w_desc)
        .cast("bigint"),
    )
    ln_e4 = F.when(
        (F.col("d_events") > 0) & (F.col("d_events") < F.col("n_risk")),
        F.round(
            F.log(
                1.0 - F.col("d_events").cast("double") / F.col("n_risk")
            )
            * 10000
        ).cast("bigint"),
    ).otherwise(F.lit(0).cast("bigint"))
    w_asc = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    return (
        risk.withColumn("ln_e4", ln_e4)
        .select(
            F.col("t").alias("t_days"),
            "n_risk",
            "d_events",
            "c_censored",
            F.sum("ln_e4").over(w_asc).cast("bigint").alias("survival_ln_e4"),
            (F.col("d_events") == F.col("n_risk")).alias("absorbs_all"),
        )
    )


customer_km_survival.__doc__ = customer_km_survival.__doc__.replace(
    "{h}", str(_KM_HORIZON_DAYS)
)


@register(
    "orders_calendar_rollup",
    oracle="""
    WITH span AS (
        SELECT CAST(min(epoch(o_orderdate)) // 86400 AS BIGINT) AS d0,
               CAST(max(epoch(o_orderdate)) // 86400 AS BIGINT) AS d1
        FROM orders
    ),
    cal AS (
        -- fixed-range series + filter (DuckDB's generate_series cannot
        -- take a lateral column bound -- the ORACLE_MAX_POS idiom)
        SELECT CAST(d0 + i AS BIGINT) AS day,
               CAST((d0 + i + 4) % 7 AS BIGINT) AS dow,
               (d0 + i + 4) % 7 IN (5, 6) AS is_weekend
        FROM span, generate_series(0, 20000) t(i)
        WHERE i <= d1 - d0
    ),
    daily AS (
        SELECT CAST(epoch(o_orderdate) // 86400 AS BIGINT) AS day,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                   AS BIGINT) AS cents
        FROM orders GROUP BY 1
    )
    SELECT c.dow, c.is_weekend,
           CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(coalesce(d.n_orders, 0)) AS BIGINT) AS n_orders,
           CAST(sum(coalesce(d.cents, 0)) AS BIGINT) AS revenue_cents,
           CAST(sum(coalesce(d.cents, 0)) // count(*) AS BIGINT)
               AS cents_per_day
    FROM cal c LEFT JOIN daily d ON c.day = d.day
    GROUP BY c.dow, c.is_weekend
    """,
    tags=("ext-analytics", "calendar-dim", "A8"),
)
def orders_calendar_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-dimension build + day-of-week revenue rollup
    (extension — the warehouse date-spine pattern: generate the
    complete calendar between the data's first and last day so
    zero-order days COUNT in per-day averages instead of silently
    vanishing): epoch-day spine via sequence, day-of-week by pure
    integer arithmetic ((day+4) mod 7 — epoch day 0 was a Thursday),
    weekend flag, left join of daily revenue onto the spine, rollup
    by dow.  All exact integers.

    Scale shape: the spine is calendar-sized (generated, not
    scanned) and broadcastable; daily revenue is one
    map-side-combinable rollup; the final group is 7 rows.  The same
    spine serves seasonality, gap-fill, and SLA reports."""
    o = table(spark, sf_dir, "orders")
    day = F.expr("CAST(unix_timestamp(o_orderdate) AS BIGINT) div 86400")
    span = o.agg(
        F.min(day).cast("bigint").alias("d0"),
        F.max(day).cast("bigint").alias("d1"),
    )
    cal = span.select(
        F.explode(F.sequence(F.lit(0), F.col("d1") - F.col("d0"))).alias("i"),
        "d0",
    ).select(
        (F.col("d0") + F.col("i")).cast("bigint").alias("day"),
        ((F.col("d0") + F.col("i") + 4) % 7).cast("bigint").alias("dow"),
        ((F.col("d0") + F.col("i") + 4) % 7).isin(5, 6).alias("is_weekend"),
    )
    daily = o.groupBy(day.alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents"),
    )
    return (
        cal.join(daily, "day", "left")
        .groupBy("dow", "is_weekend")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.sum(F.coalesce("n_orders", F.lit(0)))
            .cast("bigint")
            .alias("n_orders"),
            F.sum(F.coalesce("cents", F.lit(0)))
            .cast("bigint")
            .alias("revenue_cents"),
        )
        .select(
            "dow",
            "is_weekend",
            "n_days",
            "n_orders",
            "revenue_cents",
            F.expr("revenue_cents div n_days")
            .cast("bigint")
            .alias("cents_per_day"),
        )
    )


# One-way ANOVA F from exact per-group integer accumulators — shared
# expression text (the _AB_Z_SQL / stats.py discipline).  Inputs:
# k groups, n total, s/ss totals, and the between-group sum of
# (group_sum^2 / group_n) carried exactly as a double expression.
_ANOVA_F_SQL = (
    "(((sb - CAST(s AS DOUBLE) * s / n) / (k - 1.0))"
    " / nullif((CAST(ss AS DOUBLE) - sb) / (n - k), 0.0))"
)


@register(
    "part_price_anova_f",
    oracle=f"""
    WITH g AS (
        SELECT p_brand,
               CAST(count(*) AS BIGINT) AS gn,
               CAST(sum(CAST(round(p_retailprice * 100) AS BIGINT))
                   AS BIGINT) AS gs,
               CAST(sum(CAST(round(p_retailprice * 100) AS BIGINT)
                        * CAST(round(p_retailprice * 100) AS BIGINT))
                   AS BIGINT) AS gss
        FROM part GROUP BY p_brand
    ),
    acc AS (
        SELECT CAST(count(*) AS BIGINT) AS k,
               CAST(sum(gn) AS BIGINT) AS n,
               CAST(sum(gs) AS BIGINT) AS s,
               CAST(sum(gss) AS BIGINT) AS ss,
               sum(CAST(gs AS DOUBLE) * gs / gn) AS sb
        FROM g
    )
    SELECT k, n,
           CAST(round({_ANOVA_F_SQL} * 1000000) AS BIGINT) AS f_micro,
           CAST(k - 1 AS BIGINT) AS df_between,
           CAST(n - k AS BIGINT) AS df_within
    FROM acc
    """,
    tags=("ext-analytics", "anova", "F14"),
)
def part_price_anova_f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F statistic — does mean retail price differ
    across brands? (extension — the k-group generalization of the
    Welch/pooled t family, F14): per-brand count/sum/sum-of-squares
    in exact integer cents, the between-group term sum(gs^2/gn)
    accumulated as the one double (each term a correctly-rounded
    ratio of exact integers; the sum over 25 brands rides the SAME
    single-partition reduction in both engines), F from one shared
    expression in micro units with both dof columns for the caller's
    p-value lookup.

    Scale shape: one map-side-combinable shuffle to the per-group
    moment frame (3 integers per group), one scalar reduction — a
    million-group ANOVA costs one aggregation, the grouped-OLS
    shape."""
    p = table(spark, sf_dir, "part")
    cents = F.round(F.col("p_retailprice") * 100).cast("bigint")
    g = p.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("gn"),
        F.sum(cents).cast("bigint").alias("gs"),
        F.sum(cents * cents).cast("bigint").alias("gss"),
    )
    acc = g.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("gn").cast("bigint").alias("n"),
        F.sum("gs").cast("bigint").alias("s"),
        F.sum("gss").cast("bigint").alias("ss"),
        F.sum(F.col("gs").cast("double") * F.col("gs") / F.col("gn")).alias(
            "sb"
        ),
    )
    return acc.select(
        "k",
        "n",
        F.round(F.expr(_ANOVA_F_SQL) * 1000000).cast("bigint").alias("f_micro"),
        F.expr("k - 1").cast("bigint").alias("df_between"),
        F.expr("n - k").cast("bigint").alias("df_within"),
    )


# Benford expected shares, ppm, from ln(1 + 1/d) / ln(10) — computed
# once here as Python literals so both engines compare against the
# identical integers.
_BENFORD_PPM = {
    d: round(__import__("math").log10(1 + 1 / d) * 1_000_000)
    for d in range(1, 10)
}


@register(
    "lineitem_benford_audit",
    oracle=f"""
    WITH digits AS (
        SELECT CAST(substr(CAST(CAST(round(l_extendedprice * 100)
                    AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS d
        FROM lineitem
        WHERE l_extendedprice > 0
    ),
    counts AS (
        SELECT d, CAST(count(*) AS BIGINT) AS n_d FROM digits GROUP BY d
    ),
    tot AS (SELECT CAST(sum(n_d) AS BIGINT) AS n FROM counts),
    bf AS (
        {" UNION ALL ".join(f"SELECT {d} AS d, CAST({p} AS BIGINT) AS benford_ppm" for d, p in _BENFORD_PPM.items())}
    )
    SELECT b.d AS first_digit,
           coalesce(c.n_d, 0) AS n_observed,
           CAST(coalesce(c.n_d, 0) * 1000000 // t.n AS BIGINT)
               AS observed_ppm,
           b.benford_ppm,
           CAST(coalesce(c.n_d, 0) * 1000000 // t.n - b.benford_ppm
               AS BIGINT) AS deviation_ppm
    FROM bf b
    LEFT JOIN counts c ON b.d = c.d
    CROSS JOIN tot t
    """,
    tags=("ext-analytics", "benford", "forensic"),
)
def lineitem_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of transaction amounts
    (extension — the forensic-accounting / data-fabrication screen:
    organically-generated amounts follow P(d) = log10(1 + 1/d);
    invented or constrained ones don't): first digits extracted by
    pure string arithmetic on exact cents (no float log in the hot
    path), observed shares in exact ppm against the Benford
    expectation precomputed once as shared integer literals.
    Large deviation_ppm rows are where an auditor looks first.
    (TPC-H-style uniform prices intentionally FAIL Benford — the
    query demonstrates detection, not conformance.)

    Scale shape: a narrow map + 9-key count — the cheapest possible
    full-scan audit; group further by month/account for the real
    drill-down at no extra passes."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_extendedprice") > 0)
    digits = li.select(
        F.substring(
            F.round(F.col("l_extendedprice") * 100).cast("bigint").cast("string"),
            1,
            1,
        )
        .cast("bigint")
        .alias("d")
    )
    counts = digits.groupBy("d").agg(F.count(F.lit(1)).cast("bigint").alias("n_d"))
    tot = counts.agg(F.sum("n_d").cast("bigint").alias("n"))
    bf = spark.createDataFrame(
        [(d, p) for d, p in _BENFORD_PPM.items()], "d bigint, benford_ppm bigint"
    )
    return (
        F.broadcast(bf)
        .join(counts, "d", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("d").alias("first_digit"),
            F.coalesce("n_d", F.lit(0)).cast("bigint").alias("n_observed"),
            F.expr("coalesce(n_d, 0) * 1000000L div n")
            .cast("bigint")
            .alias("observed_ppm"),
            "benford_ppm",
            F.expr("coalesce(n_d, 0) * 1000000L div n - benford_ppm")
            .cast("bigint")
            .alias("deviation_ppm"),
        )
    )


@register(
    "customer_order_frequency_histogram",
    oracle="""
    WITH per_cust AS (
        SELECT c.c_custkey,
               CAST(coalesce(o.n, 0) AS BIGINT) AS n_orders
        FROM customer c
        LEFT JOIN (
            SELECT o_custkey, CAST(count(*) AS BIGINT) AS n
            FROM orders GROUP BY o_custkey
        ) o ON c.c_custkey = o.o_custkey
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n_cust FROM per_cust)
    SELECT p.n_orders,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(count(*) * 1000000 // min(t.n_cust) AS BIGINT)
               AS share_ppm,
           p.n_orders = 0 AS zero_class
    FROM per_cust p CROSS JOIN tot t
    GROUP BY p.n_orders
    """,
    tags=("ext-analytics", "frequency", "zero-inflation"),
)
def customer_order_frequency_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-frequency histogram INCLUDING the zero class (extension
    — the denominator mistake the calendar spine fixes for days,
    fixed for customers: joins that start from the fact table
    silently drop never-purchasers, biasing every frequency model;
    starting from the customer dimension with a left join keeps
    them): customers per order-count bucket with exact ppm shares and
    the zero-inflation flag.

    Scale shape: one per-customer count (map-side combinable), a
    dimension-sided left join, and a rollup bounded by the frequency
    domain; the scalar total broadcasts."""
    c = table(spark, sf_dir, "customer").select("c_custkey")
    o = table(spark, sf_dir, "orders").groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    per_cust = c.join(
        o, c.c_custkey == o.o_custkey, "left"
    ).select(F.coalesce("n", F.lit(0)).cast("bigint").alias("n_orders"))
    tot = per_cust.agg(F.count(F.lit(1)).cast("bigint").alias("n_cust"))
    return (
        per_cust.crossJoin(F.broadcast(tot))
        .groupBy("n_orders")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.expr("count(1) * 1000000L div min(n_cust)")
            .cast("bigint")
            .alias("share_ppm"),
        )
        .select(
            "n_orders",
            "n_customers",
            "share_ppm",
            (F.col("n_orders") == 0).alias("zero_class"),
        )
    )


@register(
    "part_abc_xyz_matrix",
    oracle="""
    WITH m AS (
        SELECT l_partkey,
               CAST(year(l_shipdate) * 12 + month(l_shipdate) - 1
                    AS BIGINT) AS midx,
               CAST(sum(CAST(round(l_extendedprice
                    * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM lineitem GROUP BY 1, 2
    ),
    stats AS (
        SELECT l_partkey,
               CAST(count(*) AS BIGINT) AS n_months,
               CAST(sum(cents) AS BIGINT) AS total_cents,
               CAST(sum(cents * cents) AS BIGINT) AS ss
        FROM m GROUP BY l_partkey
    ),
    ranked AS (
        SELECT l_partkey, n_months, total_cents, ss,
               CAST(sum(total_cents) OVER (ORDER BY total_cents DESC,
                    l_partkey ROWS BETWEEN UNBOUNDED PRECEDING
                    AND CURRENT ROW) AS BIGINT) AS cum_cents,
               CAST(sum(total_cents) OVER () AS BIGINT) AS all_cents
        FROM stats
    ),
    classed AS (
        SELECT CASE WHEN cum_cents * 10 <= all_cents * 8 THEN 'A'
                    WHEN cum_cents * 100 <= all_cents * 95 THEN 'B'
                    ELSE 'C' END AS abc_class,
               CASE WHEN n_months > 1 AND
                         (ss - total_cents * total_cents // n_months)
                         // (n_months - 1)
                         * n_months * n_months * 4
                         < total_cents * total_cents THEN 'X'
                    WHEN n_months > 1 AND
                         (ss - total_cents * total_cents // n_months)
                         // (n_months - 1)
                         * n_months * n_months
                         < total_cents * total_cents THEN 'Y'
                    ELSE 'Z' END AS xyz_class,
               total_cents
        FROM ranked
    )
    SELECT abc_class, xyz_class,
           CAST(count(*) AS BIGINT) AS n_parts,
           CAST(sum(total_cents) AS BIGINT) AS revenue_cents
    FROM classed
    GROUP BY 1, 2
    """,
    tags=("ext-analytics", "abc-xyz", "inventory"),
)
def part_abc_xyz_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC-XYZ inventory classification matrix (extension — the
    planner's 2-D segmentation: ABC = revenue importance via the
    Pareto cut (80/95), XYZ = demand variability via the coefficient
    of variation of monthly revenue): X when CV < 1/2, Y when CV < 1,
    Z otherwise — every threshold an exact integer
    cross-multiplication (var * n^2 * k < total^2 rearranges
    CV = sd*n/total < 1/sqrt(k) squared), variance via the
    integer-division moment identity.  Output: the 3x3 matrix with
    part counts and revenue mass.  (Width audit: var * n_months^2
    stays under int64 through the bench scales; a petabyte-month
    deployment rescales cents to whole units first, the
    interarrival-stats discipline.)

    Scale shape: monthly revenue per part is one map-side-combinable
    shuffle; the Pareto rank window runs over the part-level frame
    (the Gini/pareto discipline); the matrix rollup is 9 rows."""
    li = table(spark, sf_dir, "lineitem")
    m = li.groupBy(
        "l_partkey",
        (F.year("l_shipdate") * 12 + F.month("l_shipdate") - 1)
        .cast("bigint")
        .alias("midx"),
    ).agg(
        F.sum(
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
            .cast("bigint")
        )
        .cast("bigint")
        .alias("cents")
    )
    stats = m.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_months"),
        F.sum("cents").cast("bigint").alias("total_cents"),
        F.sum(F.col("cents") * F.col("cents")).cast("bigint").alias("ss"),
    )
    w_cum = Window.orderBy(F.desc("total_cents"), "l_partkey").rowsBetween(
        Window.unboundedPreceding, 0
    )
    ranked = stats.select(
        "l_partkey",
        "n_months",
        "total_cents",
        "ss",
        F.sum("total_cents").over(w_cum).cast("bigint").alias("cum_cents"),
        F.sum("total_cents")
        .over(Window.partitionBy())
        .cast("bigint")
        .alias("all_cents"),
    )
    var_n1 = F.expr(
        "(ss - total_cents * total_cents div n_months) div (n_months - 1)"
    )
    classed = ranked.select(
        F.when(F.col("cum_cents") * 10 <= F.col("all_cents") * 8, "A")
        .when(F.col("cum_cents") * 100 <= F.col("all_cents") * 95, "B")
        .otherwise("C")
        .alias("abc_class"),
        F.when(
            (F.col("n_months") > 1)
            & (
                var_n1 * F.col("n_months") * F.col("n_months") * 4
                < F.col("total_cents") * F.col("total_cents")
            ),
            "X",
        )
        .when(
            (F.col("n_months") > 1)
            & (
                var_n1 * F.col("n_months") * F.col("n_months")
                < F.col("total_cents") * F.col("total_cents")
            ),
            "Y",
        )
        .otherwise("Z")
        .alias("xyz_class"),
        "total_cents",
    )
    return classed.groupBy("abc_class", "xyz_class").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        F.sum("total_cents").cast("bigint").alias("revenue_cents"),
    )


@register(
    "orders_activity_islands",
    oracle="""
    WITH months AS (
        SELECT DISTINCT o_custkey,
               CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1
                    AS BIGINT) AS midx
        FROM orders
    ),
    isl AS (
        SELECT o_custkey, midx,
               midx - row_number() OVER (PARTITION BY o_custkey
                   ORDER BY midx) AS island_key
        FROM months
    ),
    islands AS (
        SELECT o_custkey, island_key,
               CAST(count(*) AS BIGINT) AS streak_months,
               CAST(min(midx) AS BIGINT) AS start_midx
        FROM isl GROUP BY o_custkey, island_key
    )
    SELECT o_custkey,
           CAST(count(*) AS BIGINT) AS n_islands,
           CAST(max(streak_months) AS BIGINT) AS longest_streak,
           CAST(sum(streak_months) AS BIGINT) AS active_months,
           CAST(min(start_midx) AS BIGINT) AS first_midx
    FROM islands
    GROUP BY o_custkey
    """,
    tags=("ext-analytics", "gaps-islands", "tenure"),
)
def orders_activity_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands customer activity streaks (extension — the
    canonical interval-reconstruction idiom: consecutive active
    months collapse into islands because month_index minus the
    per-customer row_number is CONSTANT within a run): per customer,
    the number of distinct activity streaks, the longest streak, and
    total active months — the engagement-tenure report subscription
    businesses run monthly.  All integer calendar arithmetic.

    Scale shape: distinct active months per customer (map-side
    combinable), one per-customer window over the month-bounded
    frame, two bounded rollups.  The same idiom reconstructs sensor
    uptime and SLA-breach intervals."""
    o = table(spark, sf_dir, "orders")
    months = o.select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1)
        .cast("bigint")
        .alias("midx"),
    ).distinct()
    w = Window.partitionBy("o_custkey").orderBy("midx")
    isl = months.select(
        "o_custkey",
        "midx",
        (F.col("midx") - F.row_number().over(w)).alias("island_key"),
    )
    islands = isl.groupBy("o_custkey", "island_key").agg(
        F.count(F.lit(1)).cast("bigint").alias("streak_months"),
        F.min("midx").cast("bigint").alias("start_midx"),
    )
    return islands.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_islands"),
        F.max("streak_months").cast("bigint").alias("longest_streak"),
        F.sum("streak_months").cast("bigint").alias("active_months"),
        F.min("start_midx").cast("bigint").alias("first_midx"),
    )
