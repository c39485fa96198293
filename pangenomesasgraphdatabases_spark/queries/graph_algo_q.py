"""Graph algorithms over the pangenome-shaped star schema (extension).

The reference is a Neo4j graph database (02_CypherScripts/
01_creatingDatabase.cypher builds NEIGHBOUR edges between gene
clusters along each genome); beyond its pattern-match queries, a graph
engine is expected to run whole-graph algorithms.  These queries run
them Spark-first on the star-schema isomorph (FIXTURES.md section 5):
parts are gene clusters, orders are genomes, and consecutive lineitem
rows within an order are the synteny NEIGHBOUR edges.

Bit-exact oracle parity strategy (the driver hashes float bits —
VERDICT r1/r2): PageRank runs in integer fixed-point (micro-units,
BIGINT) with explicit integer division — Spark ``div`` and DuckDB
``//`` both truncate BIGINT/BIGINT identically, and BIGINT sums are
order-independent, so a fixed iteration count unrolls to an oracle
WITH-chain that matches bit-for-bit.  Triangle counting is pure
integer counting.

100 TB notes: the iteration count is FIXED (the oracle chain and the
Spark loop share one constant), so the whole PageRank build is a
single lazy Catalyst DAG — no driver-side convergence actions.  Edges
+ degrees are computed once and cached; each iteration shuffles once
on dst.  Triangle counting uses the degree-ordered orientation, which
bounds wedge fan-out by sum(min-deg choose 2) instead of
sum(deg choose 2) — the standard trick that keeps the hub explosion
off a power-law graph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pangenomesasgraphdatabases_spark.data import table
from pangenomesasgraphdatabases_spark.queries.registry import register

# PageRank fixed-point parameters: ranks in micro-units, damping 0.85
# expressed as integer (85 * s) div 100, 5 unrolled iterations.
_PR_ITERS = 5
_PR_INIT = 1_000_000
_PR_BASE = 150_000  # (1 - 0.85) * 1e6


# Bipartite purchase graph: customer (custkey*2) <-> supplier
# (suppkey*2+1), both directions so every node has out-degree >= 1
# (no dangling mass).  Node ids are BIGINTs, not 'c<k>'/'s<k>'
# strings: the graph is ~2 edges per lineitem, so every shuffle and
# sort touches the id — integer keys measured ~2x faster end-to-end.
_PR_EDGES_SQL = """
pairs AS (
    SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
edges AS (
    SELECT c AS src, s AS dst FROM pairs
    UNION ALL
    SELECT s AS src, c AS dst FROM pairs
),
deg AS (
    SELECT src, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY src
),
nodes AS (SELECT DISTINCT src AS node FROM edges)
"""


def _pr_iter_sql(k: int) -> str:
    prev = f"r{k - 1}"
    return f"""
r{k} AS (
    SELECT n.node,
           CAST({_PR_BASE} + (85 * COALESCE(m.s, 0)) // 100 AS BIGINT) AS r
    FROM nodes n
    LEFT JOIN (
        SELECT e.dst AS node, CAST(sum(p.r // d.deg) AS BIGINT) AS s
        FROM {prev} p
        JOIN deg d ON p.node = d.src
        JOIN edges e ON e.src = p.node
        GROUP BY e.dst
    ) m ON n.node = m.node
)"""


_PR_CHAIN_SQL = ",\n".join(_pr_iter_sql(k) for k in range(1, _PR_ITERS + 1))


@register(
    "graph_pagerank",
    oracle=f"""
    WITH {_PR_EDGES_SQL},
    r0 AS (SELECT node, CAST({_PR_INIT} AS BIGINT) AS r FROM nodes),
    {_PR_CHAIN_SQL}
    SELECT node, r AS rank_micro
    FROM r{_PR_ITERS}
    """,
    tags=("ext-graph", "pagerank", "iterative"),
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point PageRank ({_PR_ITERS} unrolled iterations, damping
    0.85) on the customer<->supplier purchase graph.

    Extension beyond the reference's Cypher pattern matching (its
    NEIGHBOUR graph at 02_CypherScripts/01_creatingDatabase.cypher:
    188-198 supports exactly this kind of whole-graph centrality).
    Integer micro-unit ranks: r' = 150000 + (85 * sum(r_u div deg_u))
    div 100 — every operation is exact BIGINT arithmetic, so the
    result is deterministic under any partitioning / aggregation
    order, and matches the unrolled DuckDB WITH-chain bit-for-bit.

    Scale shape: edges+degrees cached once; each iteration is one
    shuffle on dst; the fixed iteration count keeps the whole thing a
    single lazy DAG (no driver convergence loop)."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    od = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pairs = (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .distinct()
    )
    edges = pairs.select(F.col("c").alias("src"), F.col("s").alias("dst")).unionAll(
        pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # One edge frame carrying the out-degree of its source, explicitly
    # hash-partitioned on src and cached.  `ranks` leaves each
    # iteration's groupBy partitioned on node (the join key), so on a
    # cluster the ed-ranks join is co-partitioned and an iteration
    # costs one exchange (the contribution groupBy).  Caveat measured
    # on local[32]: AQE wraps the cached plan in AdaptiveSparkPlan,
    # which reports unknown outputPartitioning, so EnsureRequirements
    # still inserts the join exchanges — the dominant local cost is
    # stage scheduling, not data volume.
    ed = edges.join(deg, "src").repartition("src").cache()
    # Seed rows guarantee every node appears in the groupBy even with
    # no in-edges (they contribute 0 to the sum) — this replaces the
    # per-iteration left join against the nodes frame.
    seeds = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.lit(0).cast("long").alias("c"))
        .cache()
    )

    ranks = seeds.select("node", F.lit(_PR_INIT).cast("long").alias("r"))
    for _ in range(_PR_ITERS):
        contrib = ed.join(ranks, ed.src == ranks.node).select(
            F.col("dst").alias("node"), F.expr("r div deg").alias("c")
        )
        ranks = (
            contrib.unionByName(seeds)
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
            .select(
                "node",
                (F.lit(_PR_BASE) + F.expr("(85 * s) div 100"))
                .cast("long")
                .alias("r"),
            )
        )
    return ranks.select("node", F.col("r").alias("rank_micro"))


# Synteny adjacency graph: consecutive parts within an order (the
# star-schema image of the reference's NEIGHBOUR edges,
# 01_creatingDatabase.cypher:188-198), undirected-canonical.
_TRI_EDGES_SQL = """
pos AS (
    -- (l_orderkey, l_linenumber) is NOT unique in the testdata;
    -- ordering by (l_linenumber, l_partkey) makes the part SEQUENCE
    -- deterministic even when whole rows tie (equal rows are
    -- interchangeable), so both engines derive the same adjacency.
    SELECT l_orderkey AS o, l_partkey AS p,
           row_number() OVER (PARTITION BY l_orderkey
                              ORDER BY l_linenumber, l_partkey) AS rn
    FROM lineitem
),
adj AS MATERIALIZED (
    SELECT DISTINCT least(a.p, b.p) AS u, greatest(a.p, b.p) AS v
    FROM pos a JOIN pos b ON a.o = b.o AND b.rn = a.rn + 1
    WHERE a.p <> b.p
),
vdeg AS (
    SELECT node, CAST(count(*) AS BIGINT) AS deg
    FROM (SELECT u AS node FROM adj UNION ALL SELECT v AS node FROM adj)
    GROUP BY node
),
-- Degree-ordered orientation: every edge points from the endpoint
-- with the smaller (deg, id) to the larger, compared as a row value
-- so arbitrary 64-bit ids order correctly (no packed-key overflow).
oe AS (
    SELECT CASE WHEN (du.deg, a.u) <= (dv.deg, a.v)
                THEN a.u ELSE a.v END AS src,
           CASE WHEN (du.deg, a.u) <= (dv.deg, a.v)
                THEN a.v ELSE a.u END AS dst,
           CASE WHEN (du.deg, a.u) <= (dv.deg, a.v)
                THEN dv.deg ELSE du.deg END AS dst_deg
    FROM adj a
    JOIN vdeg du ON a.u = du.node
    JOIN vdeg dv ON a.v = dv.node
)
"""


@register(
    "graph_triangle_count",
    oracle=f"""
    WITH {_TRI_EDGES_SQL},
    tri AS (
        SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
        FROM oe e1
        JOIN oe e2 ON e1.src = e2.src
                  AND (e1.dst_deg, e1.dst) < (e2.dst_deg, e2.dst)
        JOIN oe e3 ON e3.src = e1.dst AND e3.dst = e2.dst
    ),
    corners AS (
        SELECT a AS node FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri
    )
    SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
    FROM corners
    GROUP BY node
    """,
    tags=("ext-graph", "triangles"),
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts on the part synteny graph (consecutive
    parts within an order = the reference's NEIGHBOUR edge,
    01_creatingDatabase.cypher:188-198; triangles are the smallest
    structural-variation motif).

    r16 shape (VERDICT r15 #3 next-round item, guide §2.4): sorted
    adjacency arrays + array_intersect instead of the wedge-enumeration
    self-join.  Each oriented edge (x→y) joins to BOTH endpoints'
    out-neighbor arrays and the closing corners are
    array_intersect(outN(x), outN(y)) computed in-row — the wedge rows
    (sum over nodes of out-deg², the r15 plan's 100-Window/12-SMJ
    chain's bulk) never materialize or shuffle; what shuffles is the
    edge list plus |V| adjacency arrays whose length the degree-ordered
    orientation bounds at sqrt(2m).  Each triangle {x,y,w} with
    orientation x→y→w is found exactly once, at its (x→y) edge."""
    adj = _synteny_adj(spark, sf_dir).cache()
    vdeg = _vdeg(adj)
    return _triangle_counts(adj, vdeg)


def _vdeg(adj: DataFrame) -> DataFrame:
    return (
        adj.select(F.col("u").alias("node"))
        .unionAll(adj.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )


def _triangle_counts(adj: DataFrame, vdeg: DataFrame) -> DataFrame:
    """(node, n_triangles) for every node in >= 1 triangle, via
    degree-ordered orientation + per-edge sorted-array intersection.
    ``adj`` should be cached by the caller (read by vdeg and the
    oriented-edge frame)."""
    du = vdeg.select(F.col("node").alias("u"), F.col("deg").alias("deg_u"))
    dv = vdeg.select(F.col("node").alias("v"), F.col("deg").alias("deg_v"))
    # (deg, id) compared as a struct — lexicographic, safe for any
    # 64-bit id (a packed deg*C+id key silently mis-sorts once
    # id >= C, e.g. partkeys beyond 1e7 at sf100).
    ok_u = F.struct(F.col("deg_u").alias("d"), F.col("u").alias("i"))
    ok_v = F.struct(F.col("deg_v").alias("d"), F.col("v").alias("i"))
    # vdeg is |V|-sized — broadcast both degree joins (no shuffle of
    # the edge set); cache oe partitioned on src so the adjacency-array
    # aggregation below reuses the partitioning (zero extra exchange)
    # and the edge-side join reads the cache.
    oe = (
        adj.join(F.broadcast(du), "u")
        .join(F.broadcast(dv), "v")
        .select(
            F.when(ok_u <= ok_v, F.col("u")).otherwise(F.col("v")).alias("src"),
            F.when(ok_u <= ok_v, F.col("v")).otherwise(F.col("u")).alias("dst"),
        )
        .repartition("src")
        .cache()
    )
    # Out-neighbor arrays, sorted: orientation bounds their length at
    # sqrt(2m), so no collect_list hot-key hazard by construction.
    # Cached: read once per endpoint side of the edge join below.
    nb = oe.groupBy("src").agg(
        F.sort_array(F.collect_list("dst")).alias("nbrs")
    ).cache()
    n1 = nb.select(F.col("src"), F.col("nbrs").alias("nb_src"))
    n2 = nb.select(F.col("src").alias("dst"), F.col("nbrs").alias("nb_dst"))
    ew = (
        oe.join(n1, "src")
        .join(n2, "dst")
        .select(
            "src",
            "dst",
            F.array_intersect("nb_src", "nb_dst").alias("ws"),
        )
        .filter(F.size("ws") > 0)
    )
    # Triangle {x,y,w} found at edge (x→y): +|ws| to x and y, +1 to
    # each closing corner w — emitted as ONE in-row contribution array
    # per edge (a 3-way union would re-execute the nb joins per branch
    # and triple the printed lineage).
    sz = F.size("ws").cast("long")
    contribs = F.concat(
        F.array(
            F.struct(F.col("src").alias("node"), sz.alias("c")),
            F.struct(F.col("dst").alias("node"), sz.alias("c")),
        ),
        F.transform(
            "ws",
            lambda w: F.struct(w.alias("node"), F.lit(1).cast("long").alias("c")),
        ),
    )
    corners = ew.select(F.explode(contribs).alias("x")).select(
        F.col("x.node").alias("node"), F.col("x.c").alias("c")
    )
    return corners.groupBy("node").agg(F.sum("c").alias("n_triangles"))


# Shared adjacency for components/SSSP: the same synteny edge set as
# triangle counting, expanded to both directions.
_CC_ITERS = 10

_BIDIR_SQL = """
e AS MATERIALIZED (
    SELECT u AS src, v AS dst FROM adj
    UNION ALL
    SELECT v AS src, u AS dst FROM adj
)
"""


def _cc_iter_sql(k: int) -> str:
    return f"""
l{k} AS MATERIALIZED (
    SELECT node, min(label) AS label FROM (
        SELECT e.dst AS node, l.label FROM e JOIN l{k - 1} l ON e.src = l.node
        UNION ALL
        SELECT node, label FROM l{k - 1}
    ) GROUP BY node
)"""


_CC_CHAIN_SQL = ",".join(_cc_iter_sql(k) for k in range(1, _CC_ITERS + 1))


def _bidir_edges(adj: DataFrame) -> DataFrame:
    return adj.select(F.col("u").alias("src"), F.col("v").alias("dst")).unionAll(
        adj.select(F.col("v").alias("src"), F.col("u").alias("dst"))
    )


def _synteny_adj(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct canonical (u < v) part synteny edges — the triangle
    query's adjacency, shared by components and SSSP.

    r16 (guide §2.4): consecutive rows come from lag() over the same
    (l_linenumber, p) window that used to assign row_number for an
    rn = rn+1 SELF-JOIN — one window pass replaces two executions of
    the position lineage plus a sort-merge join; the pair set is
    identical (lag pairs each row with its predecessor in the same
    deterministic order)."""
    li = table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o"),
        F.col("l_partkey").alias("p"),
        "l_linenumber",
    )
    w = Window.partitionBy("o").orderBy("l_linenumber", "p")
    return (
        li.select("o", "p", F.lag("p").over(w).alias("q"))
        .filter(F.col("q").isNotNull() & (F.col("q") != F.col("p")))
        .select(
            F.least("p", "q").alias("u"),
            F.greatest("p", "q").alias("v"),
        )
        .distinct()
    )


@register(
    "graph_components",
    oracle=f"""
    WITH {_TRI_EDGES_SQL.split(',' + chr(10) + 'vdeg')[0]},
    {_BIDIR_SQL},
    l0 AS MATERIALIZED (SELECT DISTINCT src AS node, src AS label FROM e),
    {_CC_CHAIN_SQL}
    SELECT node, label AS component
    FROM l{_CC_ITERS}
    """,
    tags=("ext-graph", "components", "iterative"),
)
def graph_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components by min-label propagation ({_CC_ITERS}
    unrolled iterations) on the part synteny graph: every node ends
    with the smallest part id reachable within {_CC_ITERS} hops — the
    full component id once the propagation has converged (pytest
    asserts the fixpoint on the testdata; `operators/components` is
    the iterate-to-convergence library variant for arbitrary graphs).

    Pure integer min-aggregation: order-independent, bit-exact vs the
    unrolled oracle chain.  One shuffle per hop; the label frame stays
    (node, BIGINT) narrow regardless of graph size.  Each hop is
    lineage-truncated (localCheckpoint; cluster deployments would use
    a reliable checkpoint dir): the label frame is referenced twice
    per iteration, so without truncation the logical plan doubles per
    hop — 2^10 scan nodes by iteration 10."""
    adj = _synteny_adj(spark, sf_dir)
    e = _bidir_edges(adj).localCheckpoint(eager=True)
    labels = e.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    for _ in range(_CC_ITERS):
        prop = e.join(labels, e.src == labels.node).select(
            F.col("dst").alias("node"), "label"
        )
        labels = (
            prop.unionByName(labels.select("node", "label"))
            .groupBy("node")
            .agg(F.min("label").alias("label"))
        ).localCheckpoint(eager=True)
    return labels.select("node", F.col("label").alias("component"))


_SSSP_ITERS = 10


def _sssp_iter_sql(k: int) -> str:
    return f"""
d{k} AS MATERIALIZED (
    SELECT node, min(dist) AS dist FROM (
        SELECT e.dst AS node, d.dist + 1 AS dist
        FROM e JOIN d{k - 1} d ON e.src = d.node
        UNION ALL
        SELECT node, dist FROM d{k - 1}
    ) GROUP BY node
)"""


_SSSP_CHAIN_SQL = ",".join(_sssp_iter_sql(k) for k in range(1, _SSSP_ITERS + 1))


@register(
    "graph_sssp_hops",
    oracle=f"""
    WITH {_TRI_EDGES_SQL.split(',' + chr(10) + 'vdeg')[0]},
    {_BIDIR_SQL},
    d0 AS MATERIALIZED (SELECT min(u) AS node, CAST(0 AS BIGINT) AS dist FROM adj),
    {_SSSP_CHAIN_SQL},
    nodes AS (SELECT DISTINCT src AS node FROM e)
    SELECT n.node, d.dist
    FROM nodes n LEFT JOIN d{_SSSP_ITERS} d ON n.node = d.node
    """,
    tags=("ext-graph", "shortest-path", "iterative"),
)
def graph_sssp_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-source shortest path (hop count, BFS frontier as
    min-dist relaxation, {_SSSP_ITERS} unrolled iterations) from the
    lowest part id over the synteny graph; unreached nodes stay NULL.
    The reference's Cypher shortestPath() (J14 family) generalized to
    a whole-graph distance map.

    Integer relaxation only — exact parity with the unrolled oracle.
    The reached-set frame grows monotonically but stays (node, dist)
    narrow; one shuffle per hop, lineage-truncated per hop (see
    graph_components — the dist frame is referenced twice per
    iteration, so truncation keeps the plan linear)."""
    adj = _synteny_adj(spark, sf_dir)
    e = _bidir_edges(adj).localCheckpoint(eager=True)
    dist = adj.agg(F.min("u").alias("node")).select(
        "node", F.lit(0).cast("long").alias("dist")
    )
    for _ in range(_SSSP_ITERS):
        relax = e.join(dist, e.src == dist.node).select(
            F.col("dst").alias("node"), (F.col("dist") + 1).alias("dist")
        )
        dist = (
            relax.unionByName(dist.select("node", "dist"))
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
        ).localCheckpoint(eager=True)
    nodes = e.select("src").distinct().select(F.col("src").alias("node"))
    return nodes.join(dist, "node", "left").select("node", "dist")


@register(
    "graph_degree_stats",
    oracle=f"""
    WITH {_TRI_EDGES_SQL.split(',' + chr(10) + 'vdeg')[0]},
    {_BIDIR_SQL},
    deg AS (
        SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY src
    )
    SELECT deg, CAST(count(*) AS BIGINT) AS n_nodes
    FROM deg GROUP BY deg
    """,
    tags=("ext-graph", "degree"),
)
def graph_degree_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the part synteny graph — the first
    health check on any graph build (the reference eyeballs NEIGHBOUR
    edge counts the same way after 01_creatingDatabase.cypher:91).
    Two integer aggregations; the second input is one row per node."""
    adj = _synteny_adj(spark, sf_dir)
    deg = (
        _bidir_edges(adj)
        .groupBy("src")
        .agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
    )
    return deg.groupBy("deg").agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))


_KCORE_K = 30
_KCORE_ROUNDS = 10


def _kcore_iter_sql(k: int) -> str:
    return f"""
s{k} AS MATERIALIZED (
    SELECT src FROM e{k - 1} GROUP BY src HAVING count(*) >= {_KCORE_K}
),
e{k} AS MATERIALIZED (
    SELECT t.src, t.dst
    FROM e{k - 1} t
    JOIN s{k} a ON t.src = a.src
    JOIN s{k} b ON t.dst = b.src
)"""


_KCORE_CHAIN_SQL = ",".join(_kcore_iter_sql(k) for k in range(1, _KCORE_ROUNDS + 1))


@register(
    "graph_kcore",
    oracle=f"""
    WITH {_TRI_EDGES_SQL.split(',' + chr(10) + 'vdeg')[0]},
    {_BIDIR_SQL},
    e0 AS MATERIALIZED (SELECT src, dst FROM e),
    {_KCORE_CHAIN_SQL}
    SELECT src AS node, CAST(count(*) AS BIGINT) AS core_deg
    FROM e{_KCORE_ROUNDS} GROUP BY src
    """,
    tags=("ext-graph", "kcore", "iterative"),
)
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-core (K=30, _KCORE_K) of the part synteny graph by iterative
    peeling (10 unrolled rounds, _KCORE_ROUNDS): repeatedly drop nodes
    with degree < K and their incident edges; what survives is the
    maximal subgraph of minimum degree K — the dense backbone
    a community analysis starts from (generalizes the reference's
    core-genome HAVING-count selection, RGPs.ipynb cell 5, to graph
    connectivity).  pytest asserts the peel has reached its fixpoint
    within the unrolled rounds on the testdata.

    Integer-only (degrees, ids): bit-exact vs the unrolled oracle.
    Each round is a groupBy + two semi-joins on the shrinking edge
    frame, lineage-truncated per round so the plan stays linear."""
    adj = _synteny_adj(spark, sf_dir)
    edges = _bidir_edges(adj).localCheckpoint(eager=True)
    for _ in range(_KCORE_ROUNDS):
        keep = (
            edges.groupBy("src")
            .agg(F.count(F.lit(1)).alias("deg"))
            .filter(F.col("deg") >= _KCORE_K)
            .select("src")
        )
        edges = (
            edges.join(keep, "src")
            .join(keep.select(F.col("src").alias("dst")), "dst")
            .select("src", "dst")
        ).localCheckpoint(eager=True)
    return edges.groupBy("src").agg(
        F.count(F.lit(1)).cast("bigint").alias("core_deg")
    ).select(F.col("src").alias("node"), "core_deg")


# Label propagation: synchronous mode-update LPA, fixed 3 iterations,
# deterministic tie-break (count DESC, label ASC) so both engines pick
# identical winners.
_LPA_ITERS = 3


def _lpa_oracle() -> str:
    chain = []
    for i in range(_LPA_ITERS):
        prev = f"l{i}"
        chain.append(f"""
    votes{i} AS (
        SELECT e.dst AS node, p.label, CAST(count(*) AS BIGINT) AS c
        FROM edges e JOIN {prev} p ON e.src = p.node
        GROUP BY e.dst, p.label
    ),
    l{i + 1} AS (
        SELECT node, label FROM (
            SELECT node, label,
                   row_number() OVER (PARTITION BY node
                       ORDER BY c DESC, label ASC) AS rn
            FROM votes{i}
        ) WHERE rn = 1
    )""")
    return f"""
    WITH {_PR_EDGES_SQL},
    l0 AS (SELECT node, node AS label FROM nodes),
    {",".join(chain)}
    SELECT l.node, l.label AS community,
           CAST(count(*) OVER (PARTITION BY l.label) AS BIGINT)
               AS community_size
    FROM l{_LPA_ITERS} l
    """


@register(
    "graph_label_propagation",
    oracle=_lpa_oracle(),
    tags=("ext-graph", "community", "iterative"),
)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-propagation community detection on the customer-supplier
    purchase graph (extension — the standard near-linear community
    algorithm): every node starts as its own label; each of 3
    SYNCHRONOUS iterations relabels a node with the most frequent
    label among its neighbours, ties broken by the smaller label —
    fully deterministic (classic async LPA is run-order dependent;
    the synchronous mode-update with a total tie order is the
    reproducible variant a data pipeline needs).  Fixed iteration
    count keeps Spark plan and oracle CTE chain identical.

    Scale shape: per iteration one join (edges x labels, both keyed)
    and one (node, label) count — the same one-shuffle-per-round
    pattern as PageRank; the vote argmax is a per-node window over
    the vote list (bounded by distinct neighbour labels).  Edges are
    computed once and cached; 3 iterations = one lazy DAG."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    od = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pairs = (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .distinct()
    )
    edges = (
        pairs.select(F.col("c").alias("src"), F.col("s").alias("dst"))
        .unionAll(pairs.select(F.col("s").alias("src"), F.col("c").alias("dst")))
        .cache()
    )
    labels = edges.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    for _ in range(_LPA_ITERS):
        votes = (
            edges.join(labels, edges.src == labels.node)
            .groupBy(F.col("dst").alias("node2"), "label")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        w = Window.partitionBy("node2").orderBy(F.desc("c"), F.asc("label"))
        labels = (
            votes.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(F.col("node2").alias("node"), "label")
        )
    return labels.select(
        "node",
        F.col("label").alias("community"),
        F.count(F.lit(1))
        .over(Window.partitionBy("label"))
        .cast("bigint")
        .alias("community_size"),
    )


@register(
    "graph_link_prediction",
    oracle="""
    WITH adj AS (
        SELECT DISTINCT o.o_custkey AS cust, l.l_suppkey AS supp
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    cdeg AS (
        SELECT cust, CAST(count(*) AS BIGINT) AS cdeg FROM adj GROUP BY cust
    ),
    sdeg AS (
        SELECT supp, CAST(count(*) AS BIGINT) AS sdeg FROM adj GROUP BY supp
    ),
    pairs AS (
        SELECT a.supp AS supp_a, b.supp AS supp_b, a.cust
        FROM adj a JOIN adj b
          ON a.cust = b.cust AND a.supp < b.supp
    ),
    scored AS (
        SELECT p.supp_a, p.supp_b,
               CAST(count(*) AS BIGINT) AS common_neighbors,
               CAST(sum(10000000000 //
                    CAST(round(ln(CAST(c.cdeg AS DOUBLE)) * 10000) AS BIGINT))
                    AS BIGINT) AS adamic_adar_fx
        FROM pairs p JOIN cdeg c ON p.cust = c.cust
        GROUP BY 1, 2
        HAVING count(*) >= 3
    )
    SELECT s.supp_a, s.supp_b, s.common_neighbors,
           CAST(s.common_neighbors * 1000000
                // (da.sdeg + db.sdeg - s.common_neighbors) AS BIGINT)
               AS jaccard_micro,
           s.adamic_adar_fx
    FROM scored s
    JOIN sdeg da ON s.supp_a = da.supp
    JOIN sdeg db ON s.supp_b = db.supp
    """,
    tags=("ext-graph", "link-prediction"),
)
def graph_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction on the supplier one-mode projection of the
    customer-supplier purchase graph (extension — the
    common-neighbors / Jaccard / Adamic-Adar triple every graph-ML
    feature pipeline starts from): supplier pairs sharing >= 3
    customers, scored by raw common-neighbour count, Jaccard of
    their customer sets in integer micros, and Adamic-Adar — the
    degree-discounted sum 1/ln(deg(z)) — in exact fixed point (each
    customer's ln(deg) quantized to 1e-4 BEFORE the integer-division
    contribution, so the per-pair reduction is an exact integer sum;
    shared neighbours always have degree >= 2, so ln > 0).

    Scale shape: pair generation explodes per-customer supplier sets
    (the basket-pairs shape — sum of per-customer |set|^2, bounded by
    the busiest customer; salting that hub is the 100 TB watch item);
    the common-neighbors >= 3 floor prunes the pair tail before the
    degree joins; degree frames are node-sized and broadcastable."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    od = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    adj = (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .select(F.col("o_custkey").alias("cust"), F.col("l_suppkey").alias("supp"))
        .distinct()
    )
    cdeg = adj.groupBy("cust").agg(F.count(F.lit(1)).alias("cdeg"))
    sdeg = adj.groupBy("supp").agg(F.count(F.lit(1)).alias("sdeg"))
    a = adj.select("cust", F.col("supp").alias("supp_a"))
    b = adj.select("cust", F.col("supp").alias("supp_b"))
    pairs = a.join(b, "cust").filter(F.col("supp_a") < F.col("supp_b"))
    aa_term = F.expr(
        "10000000000 div CAST(round(ln(CAST(cdeg AS DOUBLE)) * 10000) AS BIGINT)"
    )
    scored = (
        pairs.join(F.broadcast(cdeg), "cust")
        .groupBy("supp_a", "supp_b")
        .agg(
            F.count(F.lit(1)).alias("common_neighbors"),
            F.sum(aa_term).cast("bigint").alias("adamic_adar_fx"),
        )
        .filter(F.col("common_neighbors") >= 3)
    )
    da = sdeg.select(F.col("supp").alias("supp_a"), F.col("sdeg").alias("da"))
    db = sdeg.select(F.col("supp").alias("supp_b"), F.col("sdeg").alias("db"))
    return (
        scored.join(F.broadcast(da), "supp_a")
        .join(F.broadcast(db), "supp_b")
        .select(
            "supp_a",
            "supp_b",
            "common_neighbors",
            F.expr(
                "common_neighbors * 1000000 div (da + db - common_neighbors)"
            )
            .cast("bigint")
            .alias("jaccard_micro"),
            "adamic_adar_fx",
        )
    )


@register(
    "graph_clustering_coefficient",
    oracle=f"""
    WITH {_TRI_EDGES_SQL},
    tri AS (
        SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
        FROM oe e1
        JOIN oe e2 ON e1.src = e2.src
                  AND (e1.dst_deg, e1.dst) < (e2.dst_deg, e2.dst)
        JOIN oe e3 ON e3.src = e1.dst AND e3.dst = e2.dst
    ),
    corners AS (
        SELECT a AS node FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri
    ),
    tcount AS (
        SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
        FROM corners GROUP BY node
    )
    SELECT d.node, d.deg,
           CAST(coalesce(t.n_triangles, 0) AS BIGINT) AS n_triangles,
           CAST(2 * coalesce(t.n_triangles, 0) * 1000000
                // (d.deg * (d.deg - 1)) AS BIGINT) AS clustering_micro
    FROM vdeg d LEFT JOIN tcount t ON d.node = t.node
    WHERE d.deg >= 2
    """,
    tags=("ext-graph", "clustering-coefficient"),
)
def graph_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient per node — 2T(v) / deg(v)(deg(v)-1)
    in exact integer micros (extension; the transitivity statistic of
    network biology: how clique-like each gene cluster's synteny
    neighbourhood is).  Triangle counts come from the degree-ordered
    orientation (graph_triangle_count above — wedge fan-out bounded by
    sqrt(2m)); the coefficient is one broadcast-sized join from vdeg
    and one exact integer division, zero-triangle nodes included via
    the left join.

    Scale shape: everything downstream of the per-edge intersection is
    keyed on node; vdeg is |V|-sized.  No new shuffle class beyond the
    triangle query itself.  r16: shares ONE cached adjacency and one
    vdeg with the triangle counts (the pre-r16 shape re-derived both
    from scratch — two extra executions of the window lineage)."""
    adj = _synteny_adj(spark, sf_dir).cache()
    vdeg = _vdeg(adj)
    tcount = _triangle_counts(adj, vdeg)
    return (
        vdeg.filter(F.col("deg") >= 2)
        .join(tcount, "node", "left")
        .select(
            "node",
            "deg",
            F.coalesce("n_triangles", F.lit(0)).cast("bigint").alias("n_triangles"),
            F.expr(
                "CAST(2 * coalesce(n_triangles, 0) * 1000000"
                " div (deg * (deg - 1)) AS BIGINT)"
            ).alias("clustering_micro"),
        )
    )


# Pearson assortativity from exact integer accumulators — one shared
# expression shape evaluated over (m, sx, sy, sxx, syy, sxy).
_ASSORT_R_SQL = (
    "((CAST(m AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)"
    " / sqrt((CAST(m AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)"
    " * (CAST(m AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)))"
)


@register(
    "graph_degree_assortativity",
    oracle=f"""
    WITH {_TRI_EDGES_SQL.split(',' + chr(10) + 'vdeg')[0]},
    {_BIDIR_SQL},
    deg AS (
        SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY src
    ),
    pts AS (
        SELECT ds.deg AS x, dd.deg AS y
        FROM e
        JOIN deg ds ON e.src = ds.src
        JOIN deg dd ON e.dst = dd.src
    ),
    acc AS (
        SELECT CAST(count(*) AS BIGINT) AS m,
               CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x * x) AS BIGINT) AS sxx,
               CAST(sum(y * y) AS BIGINT) AS syy,
               CAST(sum(x * y) AS BIGINT) AS sxy
        FROM pts
    )
    SELECT m, sx, sxy,
           CAST(round({_ASSORT_R_SQL} * 1000000) AS BIGINT)
               AS assortativity_micro
    FROM acc
    """,
    tags=("ext-graph", "assortativity"),
)
def graph_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the part synteny graph (extension — the
    Newman network-science summary: do high-degree nodes link to
    high-degree nodes?): Pearson correlation of endpoint degrees over
    the directed edge list (both directions, so the statistic is the
    standard undirected one).  Every accumulator is an exact bigint
    (degrees and their products), so the final r is one
    correctly-rounded double expression of exact integers — reported
    in micro units.

    Scale shape: degrees reduce once from the edge list; the
    edge-degree join shuffles on node ids twice (or rides a broadcast
    when the degree frame is dimension-sized); the correlation is a
    scalar aggregate with map-side partials.  No windows, no
    all-pairs."""
    adj = _synteny_adj(spark, sf_dir)
    e = _bidir_edges(adj)
    deg = e.groupBy("src").agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
    pts = (
        e.join(deg.withColumnRenamed("src", "n1").withColumnRenamed("deg", "x"),
               F.col("src") == F.col("n1"))
        .join(
            deg.withColumnRenamed("src", "n2").withColumnRenamed("deg", "y"),
            F.col("dst") == F.col("n2"),
        )
        .select("x", "y")
    )
    acc = pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
    )
    return acc.select(
        "m",
        "sx",
        "sxy",
        F.round(F.expr(_ASSORT_R_SQL) * 1000000)
        .cast("bigint")
        .alias("assortativity_micro"),
    )


# --- Distributed exact complete-linkage (F17, VERDICT r10 #5) ---------------
# SF-invariant fixture from document ids (every SF contains ids
# 0..479): 30 eight-item CLIQUE blobs (ids < 240, blob = id // 8, all
# 28 within-blob pairs <= t) whose complete-linkage cut merges the
# whole blob, plus 80 CHAIN TRIPLES (ids 240..479, triple = (id-240)
# // 3) with d(p0,p1)=0.1, d(p1,p2)=0.2, d(p0,p2)=0.9: single linkage
# would fuse all three at t=0.3, complete linkage merges ONLY {p0,p1}
# (d({p0,p1},{p2}) = max(0.2, 0.9) > t) — so the oracle distinguishes
# the linkage, not just the components.  exact_max_items=100 forces
# the input (480 items) past the DRIVER gate onto the distributed
# per-component path; every component (<= 8 items) is exact, so
# approx=false for every row.
_LINK_T = 0.3


@register(
    "linkage_distributed_cut",
    oracle="""
    WITH ids AS (
        SELECT doc_id AS i FROM documents WHERE doc_id < 480
    )
    SELECT 'i' || lpad(CAST(i AS VARCHAR), 3, '0') AS item,
           CASE
             WHEN i < 240
                  THEN 'i' || lpad(CAST(8 * (i // 8) AS VARCHAR), 3, '0')
             WHEN (i - 240) % 3 < 2
                  THEN 'i' || lpad(CAST(240 + 3 * ((i - 240) // 3)
                                        AS VARCHAR), 3, '0')
             ELSE 'i' || lpad(CAST(i AS VARCHAR), 3, '0')
           END AS cluster,
           false AS approx
    FROM ids
    """,
    tags=("F17", "clustering", "distributed-exact"),
)
def linkage_distributed_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F17 on the DISTRIBUTED EXACT path (VERDICT r10 #5): the
    fcluster-style complete-linkage cut at t=0.3, computed past the
    driver gate by per-component NN-chain over the <=t-graph
    components (graph/rgp_analysis.linkage_clusters_scalable).  The
    id-derived fixture (see module comment) makes every expected
    cluster label pure id arithmetic — the oracle recomputes the cut
    independently, and the chain triples pin COMPLETE-linkage
    semantics (p2 must stay out of {p0, p1}; single linkage would
    merge it), so a silent fallback to the single-linkage coarsening
    fails the hash, as does any approx=true flag."""
    from pangenomesasgraphdatabases_spark.graph.rgp_analysis import (
        linkage_clusters_scalable,
    )

    pairs = _linkage_fixture_pairs(spark, sf_dir)
    return linkage_clusters_scalable(pairs, _LINK_T, exact_max_items=100)


def _linkage_fixture_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The id-derived SF-invariant linkage fixture (module comment
    above) — shared by the per-component-NN-chain query and the
    parallel-RNN twin so both driver hashes pin the same cut."""
    from pangenomesasgraphdatabases_spark.data import table

    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 480)
    tag = F.format_string("i%03d", F.col("doc_id").cast("int"))
    ids = d.select(F.col("doc_id").alias("i"), tag.alias("item"))

    blob = ids.filter(F.col("i") < 240)
    b2 = blob.select(
        F.col("i").alias("j"),
        F.col("item").alias("item2"),
        F.floor(F.col("i") / 8).alias("g2"),
    )
    blob_pairs = (
        blob.select("i", "item", F.floor(F.col("i") / 8).alias("g"))
        .join(b2, (F.col("g") == F.col("g2")) & (F.col("i") < F.col("j")))
        .select(
            F.col("item").alias("item1"),
            "item2",
            (
                F.lit(0.1)
                + F.lit(0.001) * ((F.col("i") + F.col("j")) % 7).cast("double")
            ).alias("dist"),
        )
    )
    chain = ids.filter(F.col("i") >= 240).select(
        "i",
        "item",
        (F.lit(240) + F.lit(3) * F.floor((F.col("i") - 240) / 3)).alias(
            "base"
        ),
        ((F.col("i") - 240) % 3).alias("pos"),
    )
    c_by_pos = {
        p: chain.filter(F.col("pos") == p).select(
            F.col("base").alias(f"b{p}"), F.col("item").alias(f"it{p}")
        )
        for p in (0, 1, 2)
    }
    chain_pairs = (
        c_by_pos[0]
        .join(c_by_pos[1], F.col("b0") == F.col("b1"))
        .join(c_by_pos[2], F.col("b0") == F.col("b2"))
        .select(
            F.col("it0").alias("item1"),
            F.col("it1").alias("item2"),
            F.lit(0.1).alias("dist"),
        )
        .unionByName(
            c_by_pos[1]
            .join(c_by_pos[2], F.col("b1") == F.col("b2"))
            .select(
                F.col("it1").alias("item1"),
                F.col("it2").alias("item2"),
                F.lit(0.2).alias("dist"),
            )
        )
        .unionByName(
            c_by_pos[0]
            .join(c_by_pos[2], F.col("b0") == F.col("b2"))
            .select(
                F.col("it0").alias("item1"),
                F.col("it2").alias("item2"),
                F.lit(0.9).alias("dist"),
            )
        )
    )
    return blob_pairs.unionByName(chain_pairs)


@register(
    "linkage_rnn_cut",
    oracle="""
    WITH ids AS (
        SELECT doc_id AS i FROM documents WHERE doc_id < 480
    )
    SELECT 'i' || lpad(CAST(i AS VARCHAR), 3, '0') AS item,
           CASE
             WHEN i < 240
                  THEN 'i' || lpad(CAST(8 * (i // 8) AS VARCHAR), 3, '0')
             WHEN (i - 240) % 3 < 2
                  THEN 'i' || lpad(CAST(240 + 3 * ((i - 240) // 3)
                                        AS VARCHAR), 3, '0')
             ELSE 'i' || lpad(CAST(i AS VARCHAR), 3, '0')
           END AS cluster,
           false AS approx
    FROM ids
    """,
    tags=("F17", "clustering", "distributed-exact", "parallel-rnn"),
)
def linkage_rnn_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F17 on the r12 PARALLEL-RNN path (VERDICT r11 #5): the same
    id-derived fixture and the same expected cut as
    linkage_distributed_cut, but with the per-component gates forced
    to 2 so EVERY component (8-item clique blobs, 3-item chain
    triples) is "pathological" and runs the distributed mutual-NN
    merge loop instead of applyInPandas.  Complete linkage is
    reducible, so concurrent RNN merges reproduce the NN-chain's
    dendrogram exactly — the oracle is the SAME id arithmetic, and
    the chain triples again pin complete-vs-single semantics (p2 must
    stay out of {p0, p1}).  Any drift in the merge loop — a wrong
    mergeability rule (n_cross vs size product), a broken
    Lance-Williams max, a tie-break divergence, or an approx=true
    leak from the stall detector — fails the driver hash."""
    from pangenomesasgraphdatabases_spark.graph.rgp_analysis import (
        linkage_clusters_scalable,
    )

    pairs = _linkage_fixture_pairs(spark, sf_dir)
    return linkage_clusters_scalable(
        pairs, _LINK_T, exact_max_items=2, exact_max_pairs=2
    )
