"""Scalar function surface (SURVEY.md section 2.8) as oracle-backed queries.

Everything here stays JVM-side (built-in pyspark.sql.functions inside
whole-stage codegen); the genuinely-Python functions (delta encode,
CAI) live in pangenomesasgraphdatabases_spark.functions.sequence as
pandas_udfs and are exercised by pytest (not SQL-expressible).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pangenomesasgraphdatabases_spark.data import table
from pangenomesasgraphdatabases_spark.functions import stats as st
from pangenomesasgraphdatabases_spark.queries.registry import register


@register(
    "split_filter_hof",
    oracle="""
    SELECT p_partkey,
           coalesce(array_to_string(list_filter(string_split(p_type, ' '),
                                                x -> x != 'PLATED'), ';'), '')
               AS type_words,
           len(list_filter(string_split(p_type, ' '), x -> x != 'PLATED')) AS n_words
    FROM part
    """,
    tags=("F1", "F12"),
)
def split_filter_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1: split + filtered comprehension
    (`[x in split(feature,";") WHERE not x="0"]`,
    01_creatingDatabase.cypher:39) via higher-order functions.  Output
    stringified (split order kept — it IS the semantics); ArrayType
    output crashes the driver's canonicalizer (VERDICT r1)."""
    p = table(spark, sf_dir, "part")
    words = F.filter(F.split("p_type", " "), lambda x: x != F.lit("PLATED"))
    return p.select(
        "p_partkey",
        F.array_join(words, ";").alias("type_words"),
        F.size(words).alias("n_words"),
    )


@register(
    "replace_chains",
    oracle="""
    SELECT p_partkey,
           replace(replace(p_name, ' ', '_'), 'green', 'GREEN') AS cleaned,
           regexp_replace(p_brand, '#[0-9]+$', '', 'g') AS brand_stem
    FROM part
    """,
    tags=("F2",),
)
def replace_chains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2: replace chains (cypher-escaping replaces,
    pirateToDatabase.py:88, 120-123)."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_replace(
            F.regexp_replace("p_name", " ", "_"), "green", "GREEN"
        ).alias("cleaned"),
        F.regexp_replace("p_brand", "#[0-9]+$", "").alias("brand_stem"),
    )


@register(
    "header_field_extraction",
    oracle="""
    SELECT p_partkey,
           string_split(p_type, ' ')[1] AS finish,
           string_split(p_type, ' ')[-1] AS material,
           replace(p_brand, 'Brand#', '') AS brand_num
    FROM part
    """,
    tags=("F3", "F4"),
)
def header_field_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3/F4: delimited field extraction (FASTA header split
    `line.split(";")[0].replace(">","")`, pirateToDatabase.py:46-48)."""
    p = table(spark, sf_dir, "part")
    words = F.split("p_type", " ")
    return p.select(
        "p_partkey",
        F.element_at(words, 1).alias("finish"),
        F.element_at(words, -1).alias("material"),
        F.regexp_replace("p_brand", "Brand#", "").alias("brand_num"),
    )


@register(
    "substring_by_coordinates",
    oracle="""
    SELECT p_partkey,
           substr(p_name, 3, 8) AS sub,
           substr(p_name, 1, CAST(p_size AS INTEGER)) AS prefix_by_size
    FROM part
    """,
    tags=("F5",),
)
def substring_by_coordinates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5: 1-based coordinate substring (fullSequence[start-1:end],
    pirateToDatabase.py:269)."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.substring("p_name", 3, 8).alias("sub"),
        F.expr("substring(p_name, 1, CAST(p_size AS INT))").alias("prefix_by_size"),
    )


@register(
    "gc_content_translate",
    oracle="""
    SELECT p_partkey,
           round(100.0 * (length(p_name)
                 - length(translate(upper(p_name), 'AEIOU', '')))
                 / length(p_name), 4) AS vowel_pct
    FROM part
    WHERE length(p_name) > 0
    """,
    tags=("F8",),
)
def gc_content_translate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8: GC-content formula 100*(G+C+S)/len via translate — the exact
    UDF-free pattern used for Bio.SeqUtils.GC
    (extendingDB_FeatureAndStrainMetrics.py:51), applied to vowels of
    p_name on the star schema."""
    p = table(spark, sf_dir, "part")
    name_u = F.upper("p_name")
    pct = (
        100.0
        * (F.length("p_name") - F.length(F.translate(name_u, "AEIOU", "")))
        / F.length("p_name")
    )
    return p.filter(F.length("p_name") > 0).select(
        "p_partkey", F.round(pct, 4).alias("vowel_pct")
    )


@register(
    "array_transform_aggregate",
    oracle="""
    SELECT p_partkey,
           array_to_string(list_transform(string_split(p_type, ' '),
                                          x -> length(x)), ';') AS word_lens,
           CAST(list_sum(list_transform(string_split(p_type, ' '), x -> length(x)))
                AS BIGINT) AS total_len
    FROM part
    """,
    tags=("F12",),
)
def array_transform_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F12: array comprehension + reduce
    (`[f in nodes(path)[1..-1] | f.GC]`, RGPs.ipynb:484-488) via
    transform + aggregate higher-order functions.  Lens list stringified
    in split order (driver canonicalizer rejects ArrayType, VERDICT r1)."""
    p = table(spark, sf_dir, "part")
    words = F.split("p_type", " ")
    lens = F.transform(words, lambda x: F.length(x))
    total = F.aggregate(lens, F.lit(0).cast("bigint"), lambda acc, x: acc + x)
    return p.select(
        "p_partkey",
        F.array_join(F.transform(lens, lambda x: x.cast("string")), ";").alias(
            "word_lens"
        ),
        total.alias("total_len"),
    )


@register(
    "welch_ttest_from_stats",
    oracle="""
    WITH stats AS (
        SELECT o_orderpriority,
               avg(o_totalprice) FILTER (WHERE o_orderstatus = 'F') AS m1,
               stddev_samp(o_totalprice) FILTER (WHERE o_orderstatus = 'F') AS s1,
               count(*) FILTER (WHERE o_orderstatus = 'F') AS n1,
               avg(o_totalprice) FILTER (WHERE o_orderstatus = 'O') AS m2,
               stddev_samp(o_totalprice) FILTER (WHERE o_orderstatus = 'O') AS s2,
               count(*) FILTER (WHERE o_orderstatus = 'O') AS n2
        FROM orders
        GROUP BY o_orderpriority
    )
    SELECT o_orderpriority,
           CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
           round((m1 - m2) / sqrt(s1*s1/n1 + s2*s2/n2), 4) AS t_stat
    FROM stats
    WHERE n1 > 1 AND n2 > 1
    """,
    tags=("F14",),
)
def welch_ttest_from_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F14: Welch two-sample t statistic from summary stats
    (ttest_ind_from_stats, RGPs.ipynb:1033-1077) as pure column math."""
    o = table(spark, sf_dir, "orders")
    f = F.col("o_orderstatus") == "F"
    ofl = F.col("o_orderstatus") == "O"
    stats = o.groupBy("o_orderpriority").agg(
        F.avg(F.when(f, F.col("o_totalprice"))).alias("m1"),
        F.stddev_samp(F.when(f, F.col("o_totalprice"))).alias("s1"),
        F.count(F.when(f, 1)).alias("n1"),
        F.avg(F.when(ofl, F.col("o_totalprice"))).alias("m2"),
        F.stddev_samp(F.when(ofl, F.col("o_totalprice"))).alias("s2"),
        F.count(F.when(ofl, 1)).alias("n2"),
    )
    t = (F.col("m1") - F.col("m2")) / F.sqrt(
        F.col("s1") * F.col("s1") / F.col("n1") + F.col("s2") * F.col("s2") / F.col("n2")
    )
    return (
        stats.filter((F.col("n1") > 1) & (F.col("n2") > 1))
        .select("o_orderpriority", "n1", "n2", F.round(t, 4).alias("t_stat"))
    )


@register(
    "array_intersect_union",
    oracle="""
    WITH arrs AS (
        SELECT p_partkey,
               string_split(p_type, ' ') AS words,
               string_split(p_name, ' ') AS name_words
        FROM part
    )
    SELECT p_partkey,
           coalesce(array_to_string(list_sort(list_intersect(words, name_words)),
                                    ';'), '') AS common,
           CAST(len(list_intersect(words, name_words)) AS INTEGER) AS n_common,
           CAST(len(list_distinct(list_concat(words, name_words))) AS INTEGER)
               AS n_union
    FROM arrs
    """,
    tags=("U3", "F12"),
)
def array_intersect_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3: set intersection/union on array columns (common clusters of
    two insertions, RGPs.ipynb:2087) via array_intersect/array_union.
    Intersection sorted + stringified (driver canonicalizer rejects
    ArrayType, VERDICT r1); both engines dedupe the intersection."""
    p = table(spark, sf_dir, "part")
    words = F.split("p_type", " ")
    name_words = F.split("p_name", " ")
    inter = F.array_intersect(words, name_words)
    return p.select(
        "p_partkey",
        F.array_join(F.array_sort(inter), ";").alias("common"),
        F.size(inter).alias("n_common"),
        F.size(F.array_union(words, name_words)).alias("n_union"),
    )


_TTEST_FINAL = f"""
    SELECT o_orderpriority,
           CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
           round(t_pooled, 4) AS t_pooled,
           round({st.t_pvalue_sql('t_pooled', 'df_pooled')}, 6) AS p_pooled,
           round(t_welch, 4) AS t_welch,
           round({st.t_pvalue_sql('t_welch', 'df_welch')}, 6) AS p_welch
    FROM (
        SELECT o_orderpriority, n1, n2,
               {st.T_POOLED_SQL} AS t_pooled, {st.DF_POOLED_SQL} AS df_pooled,
               {st.T_WELCH_SQL} AS t_welch, {st.DF_WELCH_SQL} AS df_welch
        FROM moments
    ) tstats
"""


@register(
    "welch_ttest_pvalue",
    oracle=f"""
    WITH acc AS (
        SELECT o_orderpriority,
               CAST(sum(CASE WHEN o_orderstatus = 'F'
                        THEN CAST(round(o_totalprice * 100.0) AS BIGINT) END)
                    AS DOUBLE) AS s1,
               CAST(sum(CASE WHEN o_orderstatus = 'F'
                        THEN CAST(round(o_totalprice * 100.0) AS BIGINT)
                           * CAST(round(o_totalprice * 100.0) AS BIGINT) END)
                    AS DOUBLE) AS ss1,
               CAST(count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS DOUBLE) AS n1,
               CAST(sum(CASE WHEN o_orderstatus = 'O'
                        THEN CAST(round(o_totalprice * 100.0) AS BIGINT) END)
                    AS DOUBLE) AS s2,
               CAST(sum(CASE WHEN o_orderstatus = 'O'
                        THEN CAST(round(o_totalprice * 100.0) AS BIGINT)
                           * CAST(round(o_totalprice * 100.0) AS BIGINT) END)
                    AS DOUBLE) AS ss2,
               CAST(count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS DOUBLE) AS n2
        FROM orders
        GROUP BY o_orderpriority
    ),
    moments AS (
        SELECT o_orderpriority, n1, n2, {', '.join(st.MOMENTS_SQL)}
        FROM acc WHERE n1 > 1.0 AND n2 > 1.0
    )
    {_TTEST_FINAL}
    """,
    tags=("F14",),
)
def welch_ttest_pvalue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F14 complete: two-sample t *and* two-sided p-value from summary
    stats — the reference's ttest_ind_from_stats call (RGPs.ipynb cell
    19, :1033-1077; scipy default equal_var=True = pooled Student's t,
    plus the Welch variant).  Group stats come from exact integer-cent
    accumulators and the t/p math is the SAME SQL fragment text
    (functions/stats.py) evaluated by both engines, so the driver's
    exact hash compare holds; p-value approximation error vs scipy's
    betainc is < 1e-4 at these df (documented in functions/stats.py).

    Note: the cents domain does NOT cancel in t (unlike the z-score),
    but both engines see identical cent-domain stats, and t is reported
    in the cents scale consistently with df — the statistic is
    scale-free because numerator and denominator share the scale."""
    o = table(spark, sf_dir, "orders")
    xi = F.round(F.col("o_totalprice") * F.lit(100.0)).cast("bigint")
    f = F.when(F.col("o_orderstatus") == "F", xi)
    ofl = F.when(F.col("o_orderstatus") == "O", xi)
    acc = o.groupBy("o_orderpriority").agg(
        F.sum(f).cast("double").alias("s1"),
        F.sum(f * f).cast("double").alias("ss1"),
        F.count(f).cast("double").alias("n1"),
        F.sum(ofl).cast("double").alias("s2"),
        F.sum(ofl * ofl).cast("double").alias("ss2"),
        F.count(ofl).cast("double").alias("n2"),
    )
    moments = acc.where("n1 > 1.0 AND n2 > 1.0").selectExpr(
        "o_orderpriority", "n1", "n2", *st.MOMENTS_SQL
    )
    moments.createOrReplaceTempView("moments")
    return spark.sql(_TTEST_FINAL)


# Mann–Whitney U via the value HISTOGRAM, not per-row global ranks: a
# rank window over the raw rows is a single-partition sort at scale,
# while the histogram form shuffles once on the (bounded) distinct
# value domain and folds with exact integers.  Shared final fragment
# so both engines build the identical IEEE expression tree.
_MWU_FINAL = (
    "sqrt((CAST(n1 AS DOUBLE) * n2 / 12.0)"
    " * ((n1 + n2 + 1.0)"
    " - CAST(tt AS DOUBLE) / ((n1 + n2) * (n1 + n2 - 1.0))))"
)
_MWU_Z = f"((CAST(u2 AS DOUBLE) - CAST(n1 AS DOUBLE) * n2) / (2.0 * {_MWU_FINAL}))"


@register(
    "events_mannwhitney_value",
    oracle=f"""
    WITH ev AS (
        SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_a,
               CAST(round(value * 1000000) AS BIGINT) AS v
        FROM events WHERE event_type IN ('purchase', 'click')
    ),
    hist AS (
        SELECT v, CAST(sum(is_a) AS BIGINT) AS ca,
               CAST(count(*) - sum(is_a) AS BIGINT) AS cb
        FROM ev GROUP BY v
    ),
    cum AS (
        SELECT v, ca, cb,
               CAST(coalesce(sum(cb) OVER (ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS BIGINT) AS cumb
        FROM hist
    ),
    agg AS (
        SELECT CAST(sum(ca) AS BIGINT) AS n1, CAST(sum(cb) AS BIGINT) AS n2,
               CAST(sum(ca * (2 * cumb + cb)) AS BIGINT) AS u2,
               CAST(sum((ca + cb) * (ca + cb) * (ca + cb) - (ca + cb))
                    AS BIGINT) AS tt
        FROM cum
    )
    SELECT n1, n2, u2, tt,
           round({_MWU_Z}, 4) AS z_stat,
           round({st.z_pvalue_sql(_MWU_Z)}, 6) AS p_two_sided
    FROM agg
    """,
    tags=("ext-stats", "rank-test"),
)
def events_mannwhitney_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Whitney U rank test comparing `value` between 'purchase'
    and 'click' events (extension — the nonparametric complement of
    the Welch t machinery, F14): 2U_A = sum over distinct values of
    ca * (2 * cumB_less + cb) with average-tie handling, kept at 2x
    scale so every term is an exact integer; z uses the tie-corrected
    normal approximation WITHOUT continuity correction, and the
    two-sided p comes from the shared A&S erfc fragment — identical
    expression text on both engines, rounded like the Welch p.

    Scale shape: per-row global ranks need a total sort (dead at
    100 TB); the histogram form aggregates to the distinct-value
    domain (map-side combinable), runs the exclusive cumulative count
    through operators/prefix.global_cumsum (range partition +
    broadcast offsets, never a single-partition window), and closes
    with one scalar fold.  At production scale you'd additionally
    bucket continuous values; the micros quantization here IS that
    bucketing, declared in the semantics."""
    from pangenomesasgraphdatabases_spark.operators.prefix import global_cumsum

    e = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "click")
    )
    hist = (
        e.select(
            (F.col("event_type") == "purchase").cast("long").alias("is_a"),
            F.round(F.col("value") * 1000000).cast("bigint").alias("v"),
        )
        .groupBy("v")
        .agg(
            F.sum("is_a").alias("ca"),
            (F.count(F.lit(1)) - F.sum("is_a")).alias("cb"),
        )
    )
    cum = global_cumsum(hist, ["v"], "cb", "cumb_incl").withColumn(
        "cumb", F.col("cumb_incl") - F.col("cb")
    )
    t = F.col("ca") + F.col("cb")
    agg = cum.agg(
        F.sum("ca").cast("bigint").alias("n1"),
        F.sum("cb").cast("bigint").alias("n2"),
        F.sum(F.col("ca") * (2 * F.col("cumb") + F.col("cb")))
        .cast("bigint")
        .alias("u2"),
        F.sum(t * t * t - t).cast("bigint").alias("tt"),
    )
    return agg.select(
        "n1",
        "n2",
        "u2",
        "tt",
        F.expr(f"round({_MWU_Z}, 4)").alias("z_stat"),
        F.expr(f"round({st.z_pvalue_sql(_MWU_Z)}, 6)").alias("p_two_sided"),
    )
