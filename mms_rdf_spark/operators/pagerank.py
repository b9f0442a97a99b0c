"""PageRank over a KG edge table (bounded iterations, cross-engine
deterministic).

The graph-centrality companion to cc.py's connected components:
entity/link graphs built by the KG pipeline need a salience score for
canonical-entity ranking, and PageRank over the (src, dst) edge
DataFrame is the standard one.

Determinism contract (what makes the DuckDB unrolled-CTE oracle
hash-match): ranks are rounded to `precision` decimals AFTER EVERY
iteration, so both engines iterate on bit-identical vectors; all
scalar constants (1-d, d) are computed ENGINE-side from the same
literals, never pre-folded in Python (1 - 0.85 differs from a 0.15
literal in the last ulp).

Plan shape at 100 TB: the STATIC frames are built once — out-degree is
pre-joined onto the edge table (`_with_degree`) and the dangling-node
set is precomputed — so each iteration is exactly one join of ranks to
the degree-carrying edges + one dst-keyed map-side-combined aggregate +
one broadcast of the two single-row scalars (node count, dangling
mass). Edges and nodes are repartitioned on their join keys BEFORE the
localCheckpoint; the checkpointed LogicalRDD preserves that
outputPartitioning, so the E-row edge side is never re-exchanged inside
the loop — per iteration only the V-row rank/contrib frames move. No
collect() anywhere; localCheckpoint per round truncates lineage exactly
like cc.py's pointer jumping. Hot dst nodes (celebrity entities) are a
skewed aggregate, not a skewed join — partial aggregation absorbs them.

`encode=True` dictionary-encodes string node ids (KG IRIs, ~50-100
bytes) to dense longs via the distributed global rank before iterating
and decodes once at the end: shuffle bytes and hash cost inside the
loop drop ~10x at IRI-width keys, which is the difference between a
bandwidth-bound and a CPU-bound loop on a real cluster. Result is
row-identical to the string path (pinned in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _shuffle_partitions(df: DataFrame) -> int:
    return int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))


def _loop_partitions(df: DataFrame, n_rows: int) -> int:
    """Scale-adaptive partition count for iterative-loop frames (guide
    §2: derive the partitioning from input size instead of a constant
    tuned for either local mode or the cluster). The loop frames are
    repartitioned with an EXPLICIT count (required so the checkpointed
    HashPartitioning survives and the per-round joins stay
    exchange-free), which makes them AQE-coalescing-exempt — so a toy
    graph would otherwise pay shuffle.partitions near-empty tasks per
    materialization per round. ceil(n_rows / rowsPerPartition) clamped
    to [1, spark.sql.shuffle.partitions]: small inputs collapse to a
    few real tasks, large inputs keep the configured ceiling
    (production sizes via spark.sql.shuffle.partitions as before;
    rows-per-partition via spark.graft.loop.rowsPerPartition).

    NOTE this sizes LOOP STATE frames only (rank/label vectors, edge
    tables) whose row count is known; pair-generating fan-out joins
    keep skew.pin_fanout_partitions at the full shuffle.partitions —
    fan-out width is NOT predictable from input rows (the 111M-pairs
    AQE lesson)."""
    import math

    per = int(df.sparkSession.conf.get(
        "spark.graft.loop.rowsPerPartition", "65536"))
    return max(1, min(_shuffle_partitions(df),
                      math.ceil(n_rows / max(per, 1))))


def partitioned_checkpoint(df: DataFrame) -> DataFrame:
    """localCheckpoint that PRESERVES the frame's hash partitioning.

    Under AQE the checkpoint captures AdaptiveSparkPlanExec's
    partitioning, which reports Unknown before the final plan exists —
    so a `repartition(p, key).localCheckpoint()` loses its partitioning
    and every downstream join re-exchanges both sides (measured: the
    iteration join plans 2 exchanges with AQE on, 0 with it off). AQE
    is toggled off just for the checkpoint materialization so the
    LogicalRDD records HashPartitioning; iterative loops then join
    against the checkpointed E-row frame with ZERO exchanges per round
    — only the aggregate's shuffle remains."""
    spark = df.sparkSession
    key = "spark.sql.adaptive.enabled"
    prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try:
        return df.localCheckpoint()
    finally:
        spark.conf.set(key, prev)


def _node_dict(nodes: DataFrame) -> DataFrame:
    """(node, nid): dense 1-based long id per node, deterministic
    (global rank under the node total order — range partition + local
    window + P-long offset broadcast, never a single-partition
    window)."""
    from mms_rdf_spark.operators.link import global_rank

    return (global_rank(nodes.withColumn("_o", F.col("node")), "_o",
                        "node")
            .select("node", F.col("rank").alias("nid"))
            .localCheckpoint())


def _encode_edges(e: DataFrame, dict_df: DataFrame) -> DataFrame:
    """Rewrite (src, dst) string edges onto the dense long ids."""
    return (e.join(dict_df.select(F.col("node").alias("src"),
                                  F.col("nid").alias("_es")), on="src")
            .join(dict_df.select(F.col("node").alias("dst"),
                                 F.col("nid").alias("_ed")), on="dst")
            .select(F.col("_es").alias("src"), F.col("_ed").alias("dst")))


def _decode_ranks(ranks: DataFrame, dict_df: DataFrame) -> DataFrame:
    return (ranks.join(dict_df, ranks["node"] == dict_df["nid"])
            .select(dict_df["node"].alias("node"), F.col("rank")))


def _with_degree(e: DataFrame, p: int) -> tuple[DataFrame, DataFrame]:
    """(ed, deg_by_node): the edge table with its src's out-degree
    pre-joined ONCE (the degree is static across iterations — joining
    it inside the loop re-shuffles the full rank table every round for
    no reason), repartitioned on the loop's join key so the
    checkpointed partitioning is reused by every iteration."""
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    ed = partitioned_checkpoint(e.join(deg, on="src")
                                .repartition(p, "src"))
    return ed, deg.withColumnRenamed("src", "node")


def _finish_rank(nodes: DataFrame, nn, dangling: DataFrame,
                 contrib: DataFrame, one_minus_d, damping: float,
                 precision: int) -> DataFrame:
    """nn is the node count as a LITERAL Column (driver-folded int —
    exact); dangling stays a 1-row broadcast frame (data-dependent
    per round)."""
    return (nodes
            .crossJoin(F.broadcast(dangling))
            .join(contrib, nodes["node"] == contrib["dst"], "left")
            .select(
                "node",
                F.round(
                    one_minus_d / nn
                    + F.lit(damping)
                    * (F.coalesce(F.col("c"), F.lit(0.0))
                       + F.col("dm") / nn),
                    precision).alias("r")))


def _round_half_up_dp(x: float, precision: int) -> float:
    """Python mirror of Spark's F.round on doubles: HALF_UP at
    `precision` dp over the double's SHORTEST decimal representation
    (BigDecimal.valueOf(double) uses Double.toString; Python's repr is
    the same shortest round-trip form)."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(repr(float(x))).quantize(
        Decimal(1).scaleb(-precision), rounding=ROUND_HALF_UP))


def _driver_pagerank(edges: DataFrame, rows, damping: float, iters: int,
                     precision: int) -> DataFrame:
    """PageRank over a collected edge list (small-graph fast path —
    the cc._driver_union_find / bradley_terry fold="driver" precedent):
    below the driver threshold the distributed fixpoint costs ~10
    eager jobs of pure overhead. Same per-iteration arithmetic in the
    same expression order as the frame loop ((1-d)/n + d*(contrib +
    dm/n), HALF_UP-rounded per round), so the result is row-identical
    (pinned in tests and by the shared DuckDB oracle). Deterministic:
    contributions accumulate in collect order, dangling mass in sorted
    node order."""
    from pyspark.sql.types import DoubleType, StructField, StructType

    spark = edges.sparkSession
    deg: dict = {}
    nodes = set()
    for s, d in rows:
        deg[s] = deg.get(s, 0) + 1
        nodes.add(s)
        nodes.add(d)
    n = len(nodes)
    out_schema = StructType([
        StructField("node", edges.schema[0].dataType),
        StructField("rank", DoubleType()),
    ])
    if n == 0:
        return spark.createDataFrame([], out_schema)
    om = 1.0 - damping
    r = {v: _round_half_up_dp(1.0 / n, precision) for v in nodes}
    danglers = sorted(v for v in nodes if v not in deg)
    for _ in range(iters):
        c: dict = {}
        for s, d in rows:
            c[d] = c.get(d, 0.0) + r[s] / deg[s]
        dm = 0.0
        for v in danglers:
            dm += r[v]
        r = {v: _round_half_up_dp(om / n + damping
                                  * (c.get(v, 0.0) + dm / n), precision)
             for v in nodes}
    import pandas as pd

    items = sorted(r.items())
    # Arrow path for the return trip (a plain list-of-tuples
    # createDataFrame serializes row-by-row through py4j — measurable
    # at the 200k-node threshold)
    pdf = pd.DataFrame({"node": [k for k, _ in items],
                        "rank": [v for _, v in items]})
    return spark.createDataFrame(pdf, out_schema)


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iters: int = 3,
    precision: int = 8,
    encode: bool = False,
    driver_threshold: int = 200_000,
) -> DataFrame:
    """(node, rank) for every node appearing in `edges`. Dangling-node
    mass (sinks) is redistributed uniformly each iteration, so total
    rank stays ~1 (up to the per-iteration rounding). `encode=True`
    runs the iterations on dense long ids (see module docstring);
    row-identical output. Graphs at or under `driver_threshold` edges
    solve on the driver (row-identical, see _driver_pagerank); the
    encode flag is then moot since both paths are pinned identical."""
    # the loop re-references these every iteration: materialize ONCE
    # (localCheckpoint) instead of recomputing the node/degree lineage
    # `iters` times from the raw edge scan
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")) \
        .localCheckpoint()
    n_edges = e.count()
    if n_edges <= driver_threshold:
        # Arrow collect (toPandas) — the row-object collect() path costs
        # ~2x at the threshold size. Null endpoints (which pandas would
        # coerce, e.g. long -> NaN float) fall back to the frame loop.
        pdf = e.toPandas()
        if not pdf.isnull().values.any():
            rows = list(zip(pdf["src"].tolist(), pdf["dst"].tolist()))
            return _driver_pagerank(e, rows, damping, iters, precision)
    # loop partition count derived from the (checkpointed, so cheap to
    # count) edge table — n_nodes <= 2*n_edges bounds every loop frame
    p = _loop_partitions(e, n_edges)
    nodes = (e.select(F.col("src").alias("node"))
             .union(e.select(F.col("dst").alias("node")))
             .distinct())
    dict_df = None
    if encode:
        dict_df = _node_dict(nodes)
        e = _encode_edges(e, dict_df).localCheckpoint()
        nodes = dict_df.select(F.col("nid").alias("node"))
    nodes = partitioned_checkpoint(nodes.repartition(p, "node"))
    ed, deg = _with_degree(e, p)
    danglers = partitioned_checkpoint(
        nodes.join(deg, on="node", how="left_anti"))
    # node count folded ONCE to an int literal: an integer survives the
    # driver round-trip exactly (unlike float arithmetic, which must
    # stay engine-side), and keeping it as a lazy agg frame would cost
    # one count job + one broadcast PER ITERATION
    n = nodes.count()
    if n == 0:  # constant-folded 1.0/0 would raise under ANSI
        return nodes.select("node", F.lit(0.0).alias("rank"))
    nn = F.lit(n)

    one_minus_d = F.lit(1.0) - F.lit(damping)  # engine-side arithmetic
    ranks = (nodes
             .select("node", F.round(F.lit(1.0) / nn, precision)
                     .alias("r")))
    for _ in range(iters):
        contrib = (
            ranks.join(ed, ranks["node"] == ed["src"])
            .select("dst", (F.col("r") / F.col("d")).alias("_c"))
            .groupBy("dst").agg(F.sum("_c").alias("c")))
        dangling = (ranks.join(danglers, on="node", how="left_semi")
                    .agg(F.coalesce(F.sum("r"), F.lit(0.0)).alias("dm")))
        ranks = partitioned_checkpoint(
            _finish_rank(nodes, nn, dangling, contrib, one_minus_d,
                         damping, precision))
    out = ranks.select("node", F.col("r").alias("rank"))
    return _decode_ranks(out, dict_df) if encode else out


def _closed_triangles(edges: DataFrame, src: str,
                      dst: str) -> DataFrame:
    """Shared degree-ordered triangle enumeration: one row per
    triangle with its three member nodes (wu, v1, v2)."""
    a, b = F.least(F.col(src), F.col(dst)), F.greatest(F.col(src),
                                                       F.col(dst))
    und = (edges.where(F.col(src) != F.col(dst))
           .select(a.alias("a"), b.alias("b")).distinct())
    deg = (und.select(F.col("a").alias("n"))
           .union(und.select("b"))
           .groupBy("n").agg(F.count(F.lit(1)).alias("d")))
    e = (und.join(deg.withColumnRenamed("n", "a")
                  .withColumnRenamed("d", "da"), on="a")
         .join(deg.withColumnRenamed("n", "b")
               .withColumnRenamed("d", "db"), on="b"))
    lo_first = (F.col("da") < F.col("db")) | \
        ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b")))
    oriented = e.select(
        F.when(lo_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(lo_first, F.col("da")).otherwise(F.col("db")).alias("du"),
        F.when(lo_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(lo_first, F.col("db")).otherwise(F.col("da")).alias("dv"))
    w1 = oriented.select(F.col("u").alias("wu"),
                         F.col("v").alias("v1"),
                         F.col("dv").alias("dv1"))
    w2 = oriented.select(F.col("u").alias("wu"),
                         F.col("v").alias("v2"),
                         F.col("dv").alias("dv2"))
    wedges = w1.join(w2, on="wu").where(
        (F.col("dv1") < F.col("dv2"))
        | ((F.col("dv1") == F.col("dv2")) & (F.col("v1") < F.col("v2"))))
    return wedges.join(
        oriented.select(F.col("u").alias("v1"), F.col("v").alias("v2")),
        on=["v1", "v2"]).select("wu", "v1", "v2")


def triangle_count(edges: DataFrame, src: str = "src",
                   dst: str = "dst") -> DataFrame:
    """Exact triangle count of the undirected graph (single row,
    `n_triangles`), via degree-ordered orientation: direct every edge
    from its lower-(degree, id) endpoint to the higher one, list
    wedges at each source, and close them against the oriented edge
    set. Orientation bounds every node's out-degree by O(sqrt(m))
    regardless of its real degree, so a celebrity node with 10^7
    neighbors contributes wedges from its LOW-degree side only — the
    classic skew cap for the otherwise-quadratic wedge step (the same
    reason dedup caps hot LSH buckets). Two self-joins on the oriented
    edge list; counts are exact, so any engine's naive 3-way join
    (the DuckDB oracle) must agree."""
    return _closed_triangles(edges, src, dst) \
        .agg(F.count(F.lit(1)).alias("n_triangles"))


def clustering_coefficient(edges: DataFrame, src: str = "src",
                           dst: str = "dst",
                           ndigits: int = 6) -> DataFrame:
    """Local clustering coefficient per node:
    c(v) = 2·T(v) / (d(v)·(d(v)−1)) with T(v) the triangles through v
    — the per-entity cohesion signal (1 = the neighborhood is a
    clique). Nodes of degree < 2 are excluded (coefficient
    undefined). Returns (node, degree, n_tri, coeff).

    Reuses the degree-ordered triangle enumeration (same sqrt(m)
    out-degree skew cap as triangle_count); each triangle explodes to
    its three members, a map-side-combined count per node, then one
    exact-integer float expression. Exact, so the oracle's naive
    3-way-join enumeration must agree.
    """
    tris = _closed_triangles(edges, src, dst)
    per_node = (tris.select(F.explode(F.array("wu", "v1", "v2"))
                            .alias("node"))
                .groupBy("node").agg(F.count(F.lit(1)).alias("n_tri")))
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = (e.union(e.select(F.col("b"), F.col("a")))
           .where(F.col("a") != F.col("b")).distinct())
    deg = sym.groupBy(F.col("a").alias("node")) \
        .agg(F.count(F.lit(1)).alias("degree"))
    return (deg.where(F.col("degree") >= 2)
            .join(per_node, on="node", how="left")
            .na.fill(0, ["n_tri"])
            .select("node", "degree", "n_tri",
                    F.round((2 * F.col("n_tri"))
                            / (F.col("degree")
                               * (F.col("degree") - 1)), ndigits)
                    .alias("coeff")))


def random_walks(edges: DataFrame, walk_len: int = 3,
                 src: str = "src", dst: str = "dst") -> DataFrame:
    """Deterministic random-walk corpus over the graph: one walk per
    distinct source node, extended `walk_len` steps; at each step the
    next hop is the neighbor minimizing md5(walk_id|step|neighbor) — a
    per-(walk, step) uniform choice derived from a hash instead of RNG
    state, so the walk corpus is reproducible across reruns, partition
    layouts, and engines (the DeepWalk/node2vec input corpus without a
    seed to ship). Walks at a sink node simply end (no padding rows).
    Returns (walk_id, step, node).

    Per step: one join of the frontier (|walks| rows) to the edge
    table on the current node + one per-walk min-aggregate — both
    map-side combined, frontier localCheckpointed so lineage stays flat
    at any walk length. Hot hubs are a skewed JOIN key here (many walks
    standing on one node): AQE skew split covers it, and the aggregate
    after is per-walk, not per-node."""
    e = edges.select(F.col(src).alias("_es"), F.col(dst).alias("_ed")) \
        .localCheckpoint()
    frontier = (e.select(F.col("_es").alias("walk_id"))
                .distinct()
                .select("walk_id", F.lit(0).alias("step"),
                        F.col("walk_id").alias("node")))
    walks = frontier
    for step in range(1, walk_len + 1):
        cand = (frontier.join(e, frontier["node"] == e["_es"])
                .select("walk_id",
                        F.md5(F.concat_ws("|", F.col("walk_id"),
                                          F.lit(str(step)),
                                          F.col("_ed"))).alias("h"),
                        F.col("_ed").alias("nxt")))
        frontier = (cand.groupBy("walk_id")
                    .agg(F.min(F.struct("h", "nxt")).alias("b"))
                    .select("walk_id",
                            F.lit(step).alias("step"),
                            F.col("b.nxt").alias("node"))
                    ).localCheckpoint()
        walks = walks.unionByName(frontier)
    return walks


def neighborhood_mean(edges: DataFrame, features: DataFrame,
                      hops: int = 2, id_col: str = "node",
                      feature_col: str = "f",
                      src: str = "src", dst: str = "dst") -> DataFrame:
    """K-hop mean message passing (the GraphSAGE-mean primitive without
    the learned weights): hop k assigns every destination node the mean
    of its in-neighbors' hop-(k-1) values, rounded to 6 per hop so both
    engines iterate on identical doubles (the pagerank parity rule).
    Nodes whose in-neighbors carry no value at a hop drop out of that
    hop (inner join semantics). Returns (node, f) after `hops` rounds —
    the feature-propagation table a GNN pre-processing stage
    materializes before training.

    Per hop: one src-keyed join of the (narrow) feature frame to the
    edge table + one dst-keyed map-side-combined average; edges are
    localCheckpointed once, the feature frontier per hop. Averages run
    in EXACT integer micro-units (values quantized to 1e-6): a float
    mean of grid-aligned round-6 values lands mid-grid constantly, and
    engine-dependent summation order then flips the rounded digit (the
    text_lm_score sf0.1 lesson) — long sums are associative, so both
    engines divide the identical integer at every hop."""
    e = partitioned_checkpoint(
        edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
        .repartition(_loop_partitions(edges, edges.count()), "_s"))
    h = features.select(F.col(id_col).alias("node"),
                        F.col(feature_col).cast("double").alias("f"))
    for _ in range(hops):
        hu = h.select("node", F.round(F.col("f") * 1e6, 0)
                      .cast("long").alias("fu"))
        h = (hu.join(e, hu["node"] == e["_s"])
             .groupBy(F.col("_d").alias("node_"))
             .agg(F.round((F.sum("fu") / F.count(F.lit(1))) / 1e6, 6)
                  .alias("f"))
             .withColumnRenamed("node_", "node")
             ).localCheckpoint()
    return h


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
) -> DataFrame:
    """Synchronous label-propagation community detection (LPA) over the
    undirected graph: every node starts labeled with itself; each round
    it adopts the most frequent label among its neighbors, ties broken
    toward the smallest label. Returns (node, label) after `iters`
    rounds.

    Fully deterministic (no RNG, unlike classic async LPA): rounds are
    synchronous and the tiebreak is total, so the DuckDB oracle can
    unroll the same rounds as CTEs and hash-match. Unlike cc.py's
    hash-min (which converges to per-component minima), mode-adoption
    keeps DENSE regions together while letting bridges flip — a
    community signal, not reachability.

    Per round: one join of labels to the symmetrized edges on the src
    key, one (node, label) count aggregate (map-side combined — hot
    nodes collapse before the shuffle), one per-node argmax window.
    localCheckpoint truncates lineage per round (cc.py pattern). Nodes
    with no neighbors keep their own label via the left join.
    """
    from pyspark.sql.window import Window

    p = _loop_partitions(edges, edges.count())
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    sym = partitioned_checkpoint(
        (e.union(e.select(F.col("dst"), F.col("src")))
         .where(F.col("src") != F.col("dst"))
         .distinct()).repartition(p, "src"))
    nodes = partitioned_checkpoint(
        sym.select(F.col("src").alias("node")).distinct()
        .repartition(p, "node"))
    labels = nodes.select("node", F.col("node").alias("label"))
    w = Window.partitionBy("node").orderBy(
        F.col("cnt").desc(), F.col("label"))
    for _ in range(iters):
        nbr = (sym.join(labels, sym["src"] == labels["node"])
               .select(F.col("dst").alias("_n"), "label")
               .withColumnRenamed("_n", "node"))
        best = (nbr.groupBy("node", "label")
                .agg(F.count(F.lit(1)).alias("cnt"))
                .withColumn("_rn", F.row_number().over(w))
                .where(F.col("_rn") == 1)
                .select("node", "label"))
        labels = partitioned_checkpoint(
            nodes.join(best, on="node", how="left")
            .select("node",
                    F.coalesce(F.col("label"), F.col("node"))
                    .alias("label")))
    return labels


def k_core(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
) -> DataFrame:
    """Bounded-round k-core peeling: repeatedly drop nodes with degree
    < k (in the undirected simple graph) and the edges touching them,
    `iters` rounds. Returns the surviving (node, degree) — after
    enough rounds this IS the k-core; with bounded rounds it's the
    deterministic round-limited peel (each extra round only removes
    more, so survivors are always a superset of the true core).

    Per round: one degree aggregate + two semi-joins to filter the
    edge list — no windows, no driver state; localCheckpoint bounds
    lineage. At 100 TB the degree agg is map-side combined and the
    semi-joins broadcast when the survivor set is small (AQE decides).
    """
    if k < 1:
        raise ValueError("k_core: k >= 1")
    p = _loop_partitions(edges, edges.count())
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    sym = partitioned_checkpoint(
        (e.union(e.select(F.col("dst"), F.col("src")))
         .where(F.col("src") != F.col("dst"))
         .distinct()).repartition(p, "src"))
    for _ in range(iters):
        # src-partitioning survives the semi-joins (left side keeps its
        # partitioning), so the degree agg never reshuffles the edges
        deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
        keep = deg.where(F.col("d") >= k).select("src")
        sym = partitioned_checkpoint(
            sym.join(keep, on="src", how="left_semi")
            .join(keep.withColumnRenamed("src", "dst"), on="dst",
                  how="left_semi")
            .select("src", "dst"))
    return (sym.groupBy(F.col("src").alias("node"))
            .agg(F.count(F.lit(1)).alias("degree")))


def bfs_levels(
    edges: DataFrame,
    sources: DataFrame,
    max_hops: int,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node",
    directed: bool = False,
) -> DataFrame:
    """Multi-source BFS: minimum hop distance (0..max_hops) from any
    node in `sources` to every reachable node. Returns (node, dist);
    unreached nodes are absent (left-outer against the node set is the
    caller's join if needed).

    Frontier-based: each round expands ONLY the newly discovered
    frontier (anti-join against the known set), so total work is
    O(edges within max_hops), not O(rounds * edges) — the textbook
    Pregel BFS expressed as join + anti-join, localCheckpoint per
    round. Distance semantics (min over paths) come free from the
    anti-join: a node is labeled the first round it appears.
    Complements plans/closure.py's transitive_closure (reachability by
    doubling, no distances, O(log diameter) rounds vs O(diameter) here
    — use closure for deep chains, BFS for hop-bounded neighborhoods).
    """
    p = _loop_partitions(edges, edges.count())
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if not directed:
        e = e.union(e.select(F.col("dst"), F.col("src")))
    e = partitioned_checkpoint(e.distinct().repartition(p, "src"))
    dist = sources.select(F.col(node_col).alias("node"),
                          F.lit(0).alias("dist")).distinct() \
        .localCheckpoint()
    frontier = dist.select("node")
    for h in range(1, max_hops + 1):
        nxt = (frontier.join(e, frontier["node"] == e["src"])
               .select(F.col("dst").alias("node")).distinct())
        new = (nxt.join(dist, on="node", how="left_anti")
               .withColumn("dist", F.lit(h)).localCheckpoint())
        dist = dist.union(new).localCheckpoint()
        frontier = new.select("node")
    return dist


def hits(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
    precision: int = 8,
) -> DataFrame:
    """HITS hubs & authorities over the directed graph, bounded
    iterations. Returns (node, hub, auth).

    Normalization is BY THE MAX (not L2): scores stay in [0, 1], the
    ranking is identical, and max-normalization needs no sqrt-of-sum —
    one fewer float-accumulation per round, which is what lets the
    per-round round(precision) keep both engines bit-identical (the
    pagerank determinism contract). Per round: auth = incoming hub sum
    (src-keyed join + dst-keyed map-side-combined agg), hub = outgoing
    auth sum (mirrored), each followed by a broadcast 1-row max; no
    collect anywhere; localCheckpoint truncates lineage.
    """
    p = _loop_partitions(edges, edges.count())
    e0 = edges.select(F.col(src).alias("src"),
                      F.col(dst).alias("dst")).distinct()
    # the loop joins e on BOTH keys; keep one copy partitioned per key
    # (2x edge memory, zero E-row exchanges per round)
    e = partitioned_checkpoint(e0.repartition(p, "src"))
    e_dst = partitioned_checkpoint(e.repartition(p, "dst"))
    nodes = partitioned_checkpoint(
        (e.select(F.col("src").alias("node"))
         .union(e.select(F.col("dst").alias("node")))
         .distinct()).repartition(p, "node"))
    hub = nodes.select("node", F.lit(1.0).alias("h"))
    auth = nodes.select("node", F.lit(1.0).alias("a"))

    def _norm(df, col):
        mx = df.agg(F.max(col).alias("_mx"))
        return (df.crossJoin(F.broadcast(mx))
                .select("node", F.round(F.col(col) / F.col("_mx"),
                                        precision).alias(col)))

    for _ in range(iters):
        a_raw = (hub.join(e, hub["node"] == e["src"])
                 .groupBy("dst").agg(F.sum("h").alias("a")))
        auth = partitioned_checkpoint(_norm(
            nodes.join(a_raw, nodes["node"] == a_raw["dst"], "left")
            .select("node", F.coalesce(F.col("a"), F.lit(0.0)).alias("a")),
            "a"))
        h_raw = (auth.join(e_dst, auth["node"] == e_dst["dst"])
                 .groupBy("src").agg(F.sum("a").alias("h")))
        hub = partitioned_checkpoint(_norm(
            nodes.join(h_raw, nodes["node"] == h_raw["src"], "left")
            .select("node", F.coalesce(F.col("h"), F.lit(0.0)).alias("h")),
            "h"))
    return (hub.join(auth, on="node")
            .select("node", F.col("h").alias("hub"),
                    F.col("a").alias("auth")))


def degree_assortativity(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    ndigits: int = 6,
) -> DataFrame:
    """Degree assortativity of the undirected graph: the Pearson
    correlation of endpoint degrees over edges (positive = hubs link
    hubs, negative = hub-and-spoke). Returns one row
    (n_edges, assortativity).

    Both directions of every edge enter the sum (the standard
    undirected convention — the correlation is then symmetric in
    x and y, so ONE set of moment sums suffices). All five sums are
    exact longs (degrees are counts; degree^2 sums stay in int64 up
    to ~10^9-degree hubs) and r is a single float expression — the
    moment-sum discipline of analytics.grouped_ols_trend applied to
    graph topology. Plan: degree aggregate, two broadcast joins onto
    the edge list, one global aggregate.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = (e.union(e.select(F.col("b"), F.col("a")))
           .where(F.col("a") != F.col("b")).distinct())
    deg = sym.groupBy("a").agg(F.count(F.lit(1)).alias("d"))
    pairs = (sym
             .join(F.broadcast(deg.select(F.col("a"), F.col("d")
                                          .alias("_dx"))), on="a")
             .join(F.broadcast(deg.select(F.col("a").alias("b"),
                                          F.col("d").alias("_dy"))),
                   on="b"))
    s = pairs.agg(
        F.count(F.lit(1)).alias("m"),
        F.sum("_dx").alias("sx"), F.sum("_dy").alias("sy"),
        F.sum(F.col("_dx") * F.col("_dy")).alias("sxy"),
        F.sum(F.col("_dx") * F.col("_dx")).alias("sxx"),
        F.sum(F.col("_dy") * F.col("_dy")).alias("syy"))
    num = F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy")
    # each variance term fits int64; their PRODUCT does not — promote
    # to double between the two exact factors (oracle mirrors * 1.0)
    den = F.sqrt((F.col("m") * F.col("sxx")
                  - F.col("sx") * F.col("sx")) * F.lit(1.0)
                 * (F.col("m") * F.col("syy")
                    - F.col("sy") * F.col("sy")))
    return (s.where(den > 0)
            .select((F.col("m") / 2).cast("long").alias("n_edges"),
                    F.round(num / den, ndigits).alias("assortativity")))


def adamic_adar(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_deg: int | None = None,
    ndigits: int = 6,
) -> DataFrame:
    """Adamic-Adar link prediction over the undirected graph: for
    every non-adjacent-or-adjacent pair (a < b) sharing neighbors,
    score = Σ_z 1/ln(deg z) over common neighbors z — the classic
    missing-edge ranking for KG completion. Returns (a, b, score).

    Scale shape: pairs are generated per mediating node z (the basket
    self-join pattern — cost Σ deg(z)²), so `max_deg` DROPS super-hub
    mediators, observable via the degree table. That cap is also the
    statistically right one: a hub's 1/ln(deg) weight is noise while
    its deg² pair volume is the whole bill. Determinism: each z's
    weight is one float chain rounded to integer micro-units; per-pair
    scores are exact long sums converted once.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = (e.union(e.select(F.col("b"), F.col("a")))
           .where(F.col("a") != F.col("b")).distinct())
    deg = sym.groupBy(F.col("a").alias("z")) \
        .agg(F.count(F.lit(1)).alias("d"))
    keep = deg.where(F.col("d") >= 2)
    if max_deg is not None:
        keep = keep.where(F.col("d") <= max_deg)
    w_mu = F.round(F.lit(1e6) / F.log(F.col("d"))).cast("long")
    nbrs = (sym.select(F.col("a").alias("z"), F.col("b").alias("n"))
            .join(F.broadcast(keep.withColumn("_w", w_mu)
                              .select("z", "_w")), on="z"))
    from mms_rdf_spark.operators.skew import pin_fanout_partitions
    nbrs = pin_fanout_partitions(nbrs, "z")
    x = nbrs.select("z", F.col("n").alias("pa"), "_w")
    y = nbrs.select("z", F.col("n").alias("pb"))
    return (x.join(y, on="z")
            .where(F.col("pa") < F.col("pb"))
            .groupBy(F.col("pa").alias("a"), F.col("pb").alias("b"))
            .agg(F.round(F.sum("_w") / 1e6, ndigits).alias("score")))


def weighted_sssp(
    edges: DataFrame,
    sources: DataFrame,
    rounds: int,
    src: str = "src",
    dst: str = "dst",
    weight_col: str = "w",
    node_col: str = "node",
    directed: bool = False,
) -> DataFrame:
    """Multi-source weighted shortest paths, Bellman-Ford style: after
    `rounds` relaxations, (node, dist) holds the exact shortest
    distance among paths of <= `rounds` edges (non-negative integer
    weights; unreached nodes absent). Set rounds >= diameter for the
    true SSSP — bounded rounds are the deterministic contract, same as
    k_core/bfs_levels.

    Per round: one join of the current distance frame to the edge list
    on the source endpoint + one min-aggregate over (old U relaxed) —
    both map-side combined; localCheckpoint per round. Distances are
    exact longs, so any engine agrees bit-for-bit. Unlike bfs_levels'
    frontier trick, relaxation must revisit settled nodes (a longer
    path found earlier may be beaten through a later hop), so the full
    distance frame joins each round — the price of weights.
    """
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"),
                     F.col(weight_col).cast("long").alias("w"))
    if not directed:
        e = e.union(e.select(F.col("d"), F.col("s"), F.col("w")))
    p = _loop_partitions(edges, edges.count())
    e = partitioned_checkpoint(
        e.where(F.col("s") != F.col("d"))
        .groupBy("s", "d").agg(F.min("w").alias("w"))
        .repartition(p, "s"))
    dist = sources.select(F.col(node_col).alias("node"),
                          F.lit(0).cast("long").alias("dist")) \
        .distinct().localCheckpoint()
    for _ in range(rounds):
        relaxed = (dist.join(e, dist["node"] == e["s"])
                   .select(F.col("d").alias("node"),
                           (F.col("dist") + F.col("w")).alias("dist")))
        dist = (dist.unionByName(relaxed)
                .groupBy("node").agg(F.min("dist").alias("dist"))
                .localCheckpoint())
    return dist


def modularity(
    edges: DataFrame,
    labels: DataFrame,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node",
    label_col: str = "label",
    ndigits: int = 6,
) -> DataFrame:
    """Newman modularity of a node partition over the undirected
    graph: Q = Σ_c [m_c/m − (d_c/2m)²] — the standard quality score
    for label_propagation's output (compare partitions, stop
    iterating when Q plateaus). Returns one row
    (n_communities, modularity).

    m, m_c (intra-community edges) and d_c (community degree sums)
    are exact longs; each community's term is one float expression
    rounded to integer nano-units before the final sum (micro-unit
    rule — a float Σ over communities would be order-dependent).
    Plan: canonical edge set + two label joins + a per-label
    aggregate; the final fold is over |communities| rows.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = (e.union(e.select(F.col("b"), F.col("a")))
           .where(F.col("a") != F.col("b")).distinct().localCheckpoint())
    und = sym.where(F.col("a") < F.col("b"))
    mm = und.agg(F.count(F.lit(1)).alias("m"))
    lab = labels.select(F.col(node_col).alias("_n"),
                        F.col(label_col).alias("_l"))
    intra = (und
             .join(lab.withColumnRenamed("_n", "a")
                   .withColumnRenamed("_l", "_la"), on="a")
             .join(lab.withColumnRenamed("_n", "b")
                   .withColumnRenamed("_l", "_lb"), on="b")
             .where(F.col("_la") == F.col("_lb"))
             .groupBy(F.col("_la").alias("_l"))
             .agg(F.count(F.lit(1)).alias("mc")))
    degc = (sym.groupBy(F.col("a").alias("_n"))
            .agg(F.count(F.lit(1)).alias("_d"))
            .join(lab, on="_n")
            .groupBy("_l").agg(F.sum("_d").alias("dc")))
    half = F.col("dc") / (F.lit(2.0) * F.col("m"))
    term = F.coalesce(F.col("mc"), F.lit(0)) / F.col("m") - half * half
    terms = (degc.join(intra, on="_l", how="left")
             .crossJoin(F.broadcast(mm))
             .select(F.round(term * 1e9).cast("long").alias("_mu")))
    return terms.agg(
        F.count(F.lit(1)).alias("n_communities"),
        F.round(F.sum("_mu") / 1e9, ndigits).alias("modularity"))


def reciprocity(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    ndigits: int = 6,
) -> DataFrame:
    """Directed-graph reciprocity: the fraction of (distinct,
    non-loop) directed edges whose reverse edge also exists — the
    mutual-reference signal in a KG (citations vs conversations).
    One row (n_edges, n_mutual, reciprocity); exact counts, one
    division. A self-semi-join on the swapped key pair — broadcast
    when one side collapses small, plain shuffle otherwise (AQE
    decides)."""
    e = (edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
         .where(F.col("a") != F.col("b")).distinct().localCheckpoint())
    mutual = e.join(e.select(F.col("b").alias("a"),
                             F.col("a").alias("b")),
                    on=["a", "b"], how="left_semi")
    n = e.agg(F.count(F.lit(1)).alias("n_edges"))
    m = mutual.agg(F.count(F.lit(1)).alias("n_mutual"))
    return (n.crossJoin(m)
            .select("n_edges", "n_mutual",
                    F.when(F.col("n_edges") > 0,
                           F.round(F.col("n_mutual")
                                   / F.col("n_edges"), ndigits))
                    .alias("reciprocity")))


def katz_centrality(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    alpha: float = 0.1,
    iters: int = 3,
    precision: int = 8,
) -> DataFrame:
    """Katz centrality, bounded iterations:
    x(v) <- 1 + α·Σ_{u->v} x(u), x_0 = 1 — counts attenuated walks of
    every length into v, the centrality that (unlike PageRank) does
    not dilute a hub's contribution by its out-degree. Returns
    (node, katz).

    Same determinism contract as pagerank: per-round rounding to
    `precision`, α applied as an engine-side literal, per round one
    src-keyed join + one dst-keyed map-side-combined aggregate,
    localCheckpoint lineage truncation. Pick α < 1/λ_max for the
    convergent regime; bounded rounds are well-defined either way.
    """
    p = _loop_partitions(edges, edges.count())
    e = partitioned_checkpoint(
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct().repartition(p, "src"))
    nodes = partitioned_checkpoint(
        (e.select(F.col("src").alias("node"))
         .union(e.select(F.col("dst").alias("node")))
         .distinct()).repartition(p, "node"))
    x = nodes.select("node", F.lit(1.0).alias("x"))
    for _ in range(iters):
        agg = (x.join(e, x["node"] == e["src"])
               .groupBy("dst").agg(F.sum("x").alias("_s")))
        x = partitioned_checkpoint(
            nodes.join(agg, nodes["node"] == agg["dst"], "left")
            .select("node",
                    F.round(F.lit(1.0) + F.lit(alpha)
                            * F.coalesce(F.col("_s"), F.lit(0.0)),
                            precision).alias("x")))
    return x.select("node", F.col("x").alias("katz"))


def harmonic_centrality_2hop(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Bounded-radius harmonic centrality: H₂(v) = |N₁(v)| +
    ½·|N₂(v)| (direct neighbors weight 1, distance-exactly-2 nodes
    weight ½) — the distance-based centrality truncated at radius 2,
    which is the radius that stays computable as two self-joins at
    graph scale (full harmonic needs all-pairs distances). Returns
    (node, degree, n_2hop, harmonic); values are exact halves.

    The 2-hop set is mediator-join -> distinct -> anti-join against
    direct edges; cost Σ deg(mid)² — hub mediators dominate, same
    cap-or-pay trade documented for adamic_adar.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = (e.union(e.select(F.col("b"), F.col("a")))
           .where(F.col("a") != F.col("b")).distinct().localCheckpoint())
    deg = sym.groupBy(F.col("a").alias("node")) \
        .agg(F.count(F.lit(1)).alias("degree"))
    two = (sym.select(F.col("a"), F.col("b").alias("_m"))
           .join(sym.select(F.col("a").alias("_m"),
                            F.col("b").alias("w")), on="_m")
           .where(F.col("a") != F.col("w"))
           .select("a", "w").distinct()
           .join(sym.select("a", F.col("b").alias("w")),
                 on=["a", "w"], how="left_anti")
           .groupBy(F.col("a").alias("node"))
           .agg(F.count(F.lit(1)).alias("n_2hop")))
    return (deg.join(two, on="node", how="left")
            .na.fill(0, ["n_2hop"])
            .select("node", "degree", "n_2hop",
                    (F.col("degree") + F.col("n_2hop") / 2)
                    .alias("harmonic")))


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node",
    damping: float = 0.85,
    iters: int = 3,
    precision: int = 8,
) -> DataFrame:
    """Personalized PageRank: teleportation returns to the SEED set
    (uniformly) instead of all nodes — "what matters from here", the
    seed-centric relevance score KG recommendation queries need.
    Returns (node, rank); mass injects only through seeds, so
    unreachable nodes score 0.

    Same determinism and plan contract as pagerank (per-round
    rounding, engine-side constants, one join + one map-side
    aggregate per round, localCheckpoint); dangling mass returns to
    the seeds as well, keeping total mass ~1.
    """
    p = _loop_partitions(edges, edges.count())
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")) \
        .localCheckpoint()
    nodes = (e.select(F.col("src").alias("node"))
             .union(e.select(F.col("dst").alias("node")))
             .distinct())
    nodes = partitioned_checkpoint(nodes.repartition(p, "node"))
    s = seeds.select(F.col(node_col).alias("node")).distinct() \
        .join(nodes, on="node", how="left_semi").localCheckpoint()
    ns = s.agg(F.count(F.lit(1)).alias("ns"))
    ed, deg = _with_degree(e, p)
    danglers = partitioned_checkpoint(
        nodes.join(deg, on="node", how="left_anti"))
    one_minus_d = F.lit(1.0) - F.lit(damping)
    seed_flag = s.withColumn("_is_seed", F.lit(1))
    base = partitioned_checkpoint(
        nodes.join(seed_flag, on="node", how="left")
        .na.fill(0, ["_is_seed"])
        .crossJoin(F.broadcast(ns)))
    ranks = base.select(
        "node", F.round(F.col("_is_seed") / F.col("ns"), precision)
        .alias("r"))
    for _ in range(iters):
        contrib = (ranks.join(ed, ranks["node"] == ed["src"])
                   .select("dst", (F.col("r") / F.col("d")).alias("_c"))
                   .groupBy("dst").agg(F.sum("_c").alias("c")))
        dangling = (ranks.join(danglers, on="node", how="left_semi")
                    .agg(F.coalesce(F.sum("r"), F.lit(0.0))
                         .alias("dm")))
        ranks = partitioned_checkpoint(
            base
            .crossJoin(F.broadcast(dangling))
            .join(contrib, base["node"] == contrib["dst"], "left")
            .select(
                "node",
                F.round(
                    (one_minus_d + F.lit(damping) * F.col("dm"))
                    * F.col("_is_seed") / F.col("ns")
                    + F.lit(damping)
                    * F.coalesce(F.col("c"), F.lit(0.0)),
                    precision).alias("r")))
    return ranks.select("node", F.col("r").alias("rank"))


def negative_edges(edges: DataFrame, k: int = 2,
                   src: str = "src", dst: str = "dst") -> DataFrame:
    """KG-embedding training prep: k deterministic corrupted negatives
    per positive edge (the TransE tail-corruption recipe). Every node
    gets a dense position via a distributed global rank (link.py's
    range-partitioned rank — never a single-partition window); the
    j-th negative for edge (s, d) replaces d with the node at position
    (pos(d) + j * step(s, d, j)) mod n, where step is an md5-derived
    odd offset — deterministic, uniform-ish, never 0 mod n for n > 1.
    Accidental TRUE edges are removed by an anti-join against the
    positive set (false-negative filtering — the step most naive
    pipelines skip).

    Output: (src, dst, neg_dst, j). Scale shape: rank join + modular
    join + anti-join, all equi-joins on node/position keys; the only
    broadcast is the 1-row node-count frame.
    """
    from mms_rdf_spark.operators.link import global_rank

    nodes = (edges.select(F.col(src).alias("node"))
             .unionByName(edges.select(F.col(dst).alias("node")))
             .distinct())
    # dense 0-based position (global_rank is 1-based dense over
    # (order_col, id_col))
    pos = global_rank(nodes.withColumn("_o", F.col("node")), "_o",
                      "node") \
        .select("node", (F.col("rank") - 1).cast("long").alias("pos"))
    n_nodes = pos.agg(F.count(F.lit(1)).alias("_n"))

    e = (edges.select(src, dst)
         .join(pos.withColumnRenamed("node", dst), on=dst)
         .withColumnRenamed("pos", "_dpos")
         .crossJoin(F.broadcast(n_nodes)))
    js = F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("j")
    exploded = e.select(src, dst, "_dpos", "_n", js)
    step = (F.conv(F.substring(F.md5(F.concat_ws(
        chr(31), src, dst, F.col("j").cast("string"))), 1, 12), 16, 10)
        .cast("long") * 2 + 1)  # odd offset; self-hits filtered below
    neg_pos = F.pmod(F.col("_dpos") + step, F.col("_n"))
    cand = exploded.select(
        src, dst, "j", neg_pos.alias("pos")) \
        .join(pos.withColumnRenamed("node", "neg_dst"), on="pos") \
        .drop("pos")
    # false-negative filter: drop corruptions that are real edges
    positives = edges.select(F.col(src).alias("_ps"),
                             F.col(dst).alias("_pd")).distinct()
    return (cand.join(positives,
                      (cand[src] == F.col("_ps"))
                      & (cand["neg_dst"] == F.col("_pd")),
                      "left_anti")
            .where(F.col("neg_dst") != F.col(dst))
            .select(src, dst, "neg_dst", "j"))


def _bfs_sigma(e: DataFrame, srcs: DataFrame,
               max_depth: int) -> DataFrame:
    """Forward phase of Brandes: per-source BFS distances AND
    shortest-path counts. Returns (s, node, dist, sigma) for every
    reachable (source, node) pair, sigma an exact long.

    Level-synchronous: each round joins ONLY the new frontier to the
    edge table and map-side-combines sigma by (s, node); the anti-join
    against the known set gives min-distance semantics for free (same
    shape as bfs_levels, plus the sigma aggregation). Rounds = graph
    diameter; loud RuntimeError on exhaustion rather than a silently
    truncated centrality."""
    state = srcs.select(
        F.col("node").alias("s"), F.col("node"),
        F.lit(0).alias("dist"),
        F.lit(1).cast("long").alias("sigma")).localCheckpoint()
    frontier = state
    for d in range(1, max_depth + 1):
        nxt = (frontier.join(e, frontier["node"] == e["src"])
               .groupBy("s", F.col("dst").alias("node"))
               .agg(F.sum("sigma").alias("sigma")))
        new = (nxt.join(state.select("s", "node"), on=["s", "node"],
                        how="left_anti")
               .withColumn("dist", F.lit(d)).localCheckpoint())
        if new.isEmpty():
            return state
        state = state.unionByName(new).localCheckpoint()
        frontier = new
    raise RuntimeError(
        f"betweenness BFS not converged in {max_depth} rounds; "
        "raise max_depth")


def betweenness_centrality(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    sources: DataFrame | None = None,
    method: str = "auto",
    scale_threshold: int = 256,
    max_depth: int = 32,
    precision: int = 9,
) -> DataFrame:
    """Exact directed betweenness centrality (Brandes pair
    dependencies): bc(v) = sum over s != v != t of sigma_st(v) /
    sigma_st. Returns (node, betweenness) for EVERY node (0.0 when no
    shortest path passes through). Unweighted shortest paths;
    self-loops dropped; parallel edges collapse.

    Reference parity: the reference's notebook analyses rank nodes by
    degree/PageRank only; betweenness closes the classic centrality
    triple (degree / eigenvector-family / betweenness) for the KG
    entity graph.

    Two accumulation strategies, equivalence-pinned in
    tests/test_betweenness.py:

    - `pairs` (default below `scale_threshold` nodes): after one
      all-sources sigma BFS, the Bellman condition d(s,v) + d(v,t) =
      d(s,t) turns accumulation into two equi-joins on the (s, node)
      state — sigma_st(v) = sigma_sv * sigma_vt exactly (path-count
      product identity). Exact longs throughout; each (s, t, v)
      contribution is rounded to `precision` dp and summed as
      DECIMAL(28,9), so the total is ORDER-INDEPENDENT and
      hash-matches the DuckDB path-enumeration oracle.
    - `brandes` (above the threshold, or whenever `sources` samples):
      the backward dependency recursion delta(v) = sum_w sigma_v /
      sigma_w * (1 + delta(w)) processed layer by layer from the BFS
      depths — O(diameter) extra rounds, state only (s, node, delta),
      never materializing (s, t, v) triples. With `sources` = a k-node
      sample this is the standard O(k * E)-work estimator (caller
      scales by n/k if an absolute estimate is wanted).

    100 TB shape: every join is keyed on (s, node) or the edge key; no
    collect of anything graph-sized (the only driver scalars are the
    node count and max BFS depth); localCheckpoint truncates lineage
    per round, same discipline as pagerank/cc. All-pairs state is
    O(V * V) worst case — that is inherent to exact betweenness; the
    sampled-`sources` Brandes path is the scale story, identical code
    path, k * V state.
    """
    if method not in ("auto", "pairs", "brandes"):
        raise ValueError(f"unknown method: {method!r}")
    e = (edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
         .where(F.col("src") != F.col("dst"))
         .distinct().localCheckpoint())
    nodes = (e.select(F.col("src").alias("node"))
             .unionByName(e.select(F.col("dst").alias("node")))
             .distinct().localCheckpoint())
    if method == "auto":
        method = "pairs" if (sources is None
                             and nodes.count() <= scale_threshold) \
            else "brandes"
    if sources is not None and method == "pairs":
        raise ValueError("pairs accumulation needs ALL sources; use "
                         "method='brandes' with sampled sources")
    srcs = nodes if sources is None \
        else sources.select("node").distinct()
    state = _bfs_sigma(e, srcs, max_depth)

    if method == "pairs":
        a = state.select("s", F.col("node").alias("v"),
                         F.col("dist").alias("d_sv"),
                         F.col("sigma").alias("sig_sv"))
        b = state.select(F.col("s").alias("v"),
                         F.col("node").alias("t"),
                         F.col("dist").alias("d_vt"),
                         F.col("sigma").alias("sig_vt"))
        c = state.select("s", F.col("node").alias("t"),
                         F.col("dist").alias("d_st"),
                         F.col("sigma").alias("sig_st"))
        tri = (a.where(F.col("d_sv") > 0)
               .join(b.where(F.col("d_vt") > 0), on="v")
               .join(c, on=["s", "t"])
               .where(F.col("d_sv") + F.col("d_vt") == F.col("d_st")))
        contrib = F.round(
            (F.col("sig_sv") * F.col("sig_vt")).cast("double")
            / F.col("sig_st"), precision).cast("decimal(28,9)")
        bc = (tri.select(F.col("v").alias("node"),
                         contrib.alias("c"))
              .groupBy("node").agg(F.sum("c").alias("bc")))
    else:
        maxd = state.agg(F.max("dist").alias("m")).first()["m"] or 0
        delta = None  # finalized layers (s, node, delta)
        for d in range(maxd - 1, 0, -1):
            layer = state.where(F.col("dist") == d) \
                .select("s", "node", "sigma")
            succ = (layer.join(e, layer["node"] == e["src"])
                    .select("s", "node", "sigma",
                            F.col("dst").alias("w")))
            down = state.where(F.col("dist") == d + 1).select(
                "s", F.col("node").alias("w"),
                F.col("sigma").alias("sig_w"))
            j = succ.join(down, on=["s", "w"])
            if delta is not None:
                j = j.join(
                    delta.select("s", F.col("node").alias("w"),
                                 F.col("delta").alias("d_w")),
                    on=["s", "w"], how="left")
            else:
                j = j.withColumn("d_w", F.lit(None).cast("double"))
            term = (F.col("sigma").cast("double") / F.col("sig_w")
                    * (F.lit(1.0) + F.coalesce(F.col("d_w"),
                                               F.lit(0.0))))
            lay = (j.groupBy("s", "node")
                   .agg(F.round(F.sum(term), precision)
                        .alias("delta")))
            delta = lay if delta is None \
                else delta.unionByName(lay).localCheckpoint()
        if delta is None:
            bc = None
        else:
            bc = (delta.where(F.col("node") != F.col("s"))
                  .select("node",
                          F.round(F.col("delta"), precision)
                          .cast("decimal(28,9)").alias("c"))
                  .groupBy("node").agg(F.sum("c").alias("bc")))

    out = nodes
    if bc is not None:
        out = out.join(bc, on="node", how="left")
    else:
        out = out.withColumn("bc", F.lit(None).cast("decimal(28,9)"))
    return out.select(
        "node",
        F.coalesce(F.col("bc").cast("double"), F.lit(0.0))
        .alias("betweenness"))


def closeness_centrality(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_depth: int = 32,
    precision: int = 9,
) -> DataFrame:
    """Exact directed (outbound) closeness + FULL harmonic centrality:
    for each node s, over every reachable t != s at BFS distance d —
    n_reachable = |{t}|, closeness = n_reachable / sum(d) (0.0 when
    nothing is reachable), harmonic = sum(1/d). Complements
    harmonic_centrality_2hop (the bounded-radius estimate for graphs
    too large for all-pairs): this one is exact and meant for
    vocabulary/entity-type-sized graphs or sampled subgraphs.

    Determinism: harmonic sums 9dp-rounded DECIMAL(28,9) terms
    (order-independent, hash-matches the DuckDB recursive-CTE oracle);
    closeness is a single rounded division. Same all-pairs BFS state
    as betweenness_centrality — one frontier join + anti-join per
    round, localCheckpoint lineage discipline, nothing graph-sized
    ever collected."""
    e = (edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
         .where(F.col("src") != F.col("dst"))
         .distinct().localCheckpoint())
    nodes = (e.select(F.col("src").alias("node"))
             .unionByName(e.select(F.col("dst").alias("node")))
             .distinct().localCheckpoint())
    state = _bfs_sigma(e, nodes, max_depth)
    per = (state.where(F.col("dist") > 0)
           .groupBy(F.col("s").alias("node"))
           .agg(F.count(F.lit(1)).alias("n_reachable"),
                F.sum("dist").alias("_sumd"),
                F.sum(F.round(F.lit(1.0) / F.col("dist"), precision)
                      .cast("decimal(28,9)")).alias("_h")))
    return (nodes.join(per, on="node", how="left")
            .select(
                "node",
                F.coalesce(F.col("n_reachable"), F.lit(0))
                .cast("long").alias("n_reachable"),
                F.coalesce(
                    F.round(F.col("n_reachable").cast("double")
                            / F.col("_sumd"), precision),
                    F.lit(0.0)).alias("closeness"),
                F.coalesce(F.col("_h").cast("double"), F.lit(0.0))
                .alias("harmonic")))


def louvain(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    levels: int = 2,
    move_rounds: int = 4,
) -> DataFrame:
    """Deterministic synchronous Louvain community detection over the
    undirected graph. Returns (node, community); community labels are
    canonicalized to the MIN member node id.

    The classic sequential Louvain visits nodes in arbitrary order —
    non-deterministic and un-distributable. This is the synchronous
    variant (Grappolo / distributed-Louvain literature) made fully
    deterministic:

    - gain comparison in EXACT LONG arithmetic: argmax_c of
      2m * k_ic - k_i * tot'_c (the modularity gain times the positive
      constant 2m, with i removed from its own community) — no float
      rounding anywhere, so a pure-Python twin reproduces the
      partition bit-for-bit (tests/test_louvain.py);
    - ties break toward the smaller community id (total order);
    - synchronous swap oscillation (two nodes trading places forever)
      is broken by a PARITY GATE: in round r only nodes with
      crc32(node) % 2 == r % 2 may move — deterministic, and every
      node gets move_rounds/2 chances per level;
    - after move_rounds the graph coarsens (communities -> super
      nodes, intra weight -> self-loops) and the next level repeats;
      modularity is invariant under the coarsening, standard Louvain.

    Scale shape per round: one adjacency-to-labels join + one
    (node, comm) weight aggregate + one comm-degree aggregate + one
    per-node argmax window — all keyed equi-joins / map-side combines,
    localCheckpoint truncating lineage; the only driver scalar is 2m.
    Coarsening SHRINKS the graph each level, the property that makes
    Louvain usable where flat LPA stalls.
    """
    from pyspark.sql.window import Window

    e0 = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    adj = (e0.union(e0.select(F.col("v"), F.col("u")))
           .where(F.col("u") != F.col("v")).distinct()
           .withColumn("w", F.lit(1).cast("long")).localCheckpoint())
    if adj.isEmpty():
        return adj.select(F.col("u").alias("node"),
                          F.col("v").alias("community"))
    two_m = adj.agg(F.sum("w")).first()[0]  # every edge twice
    nodes = adj.select(F.col("u").alias("node")).distinct() \
        .localCheckpoint()
    mapping = nodes.select("node", F.col("node").alias("comm"))
    selfw = nodes.select(F.col("node").alias("u"),
                         F.lit(0).cast("long").alias("sw"))

    for _ in range(levels):
        lvl_nodes = adj.select(F.col("u").alias("node")).distinct() \
            .localCheckpoint()
        k = (adj.groupBy("u").agg(F.sum("w").alias("_kw"))
             .join(selfw, on="u", how="left")
             .select(F.col("u").alias("node"),
                     (F.col("_kw")
                      + 2 * F.coalesce(F.col("sw"), F.lit(0)))
                     .alias("k")).localCheckpoint())
        comm = lvl_nodes.select("node", F.col("node").alias("comm"))
        win = Window.partitionBy("node").orderBy(
            F.col("score").desc(), F.col("c").asc())
        for r in range(move_rounds):
            tot = (comm.join(k, on="node")
                   .groupBy("comm").agg(F.sum("k").alias("tot")))
            nc = (adj.join(comm.select(F.col("node").alias("v"),
                                       F.col("comm").alias("c")),
                           on="v")
                  .groupBy(F.col("u").alias("node"), "c")
                  .agg(F.sum("w").alias("kic")))
            cand = (nc.unionByName(
                comm.select("node", F.col("comm").alias("c"),
                            F.lit(0).cast("long").alias("kic")))
                .groupBy("node", "c").agg(F.max("kic").alias("kic")))
            j = (cand.join(comm, on="node").join(k, on="node")
                 .join(tot.withColumnRenamed("comm", "c"), on="c"))
            totp = F.col("tot") - F.when(
                F.col("c") == F.col("comm"), F.col("k")).otherwise(0)
            score = (F.lit(two_m) * F.col("kic")
                     - F.col("k") * totp)
            best = (j.select("node", "c", "comm",
                             score.alias("score"))
                    .withColumn("_rn", F.row_number().over(win))
                    .where(F.col("_rn") == 1))
            mover = F.crc32(F.col("node").cast("string")) % 2 \
                == F.lit(r % 2)
            comm = best.select(
                "node",
                F.when(mover, F.col("c")).otherwise(F.col("comm"))
                .alias("comm")).localCheckpoint()
        # left join: a community with no inter-community edges left is
        # absent from this level's node set — its members keep their
        # label instead of being dropped
        mapping = (mapping.join(
            comm.select(F.col("node").alias("comm"),
                        F.col("comm").alias("_new")),
            on="comm", how="left")
            .select("node", F.coalesce(F.col("_new"), F.col("comm"))
                    .alias("comm"))
            .localCheckpoint())
        # coarsen: communities become nodes; intra weight -> self-loops
        ca = comm.select(F.col("node").alias("u"),
                         F.col("comm").alias("cu"))
        cb = comm.select(F.col("node").alias("v"),
                         F.col("comm").alias("cv"))
        lifted = adj.join(ca, on="u").join(cb, on="v")
        inter = (lifted.where(F.col("cu") != F.col("cv"))
                 .groupBy(F.col("cu").alias("u"),
                          F.col("cv").alias("v"))
                 .agg(F.sum("w").alias("w")))
        intra = (lifted.where(F.col("cu") == F.col("cv"))
                 .groupBy(F.col("cu").alias("u"))
                 .agg((F.sum("w") / 2).cast("long").alias("_iw")))
        selfw = (comm.join(selfw.withColumnRenamed("u", "node"),
                           on="node", how="left")
                 .groupBy(F.col("comm").alias("u"))
                 .agg(F.sum(F.coalesce(F.col("sw"), F.lit(0)))
                      .alias("sw"))
                 .join(intra.withColumnRenamed("_iw", "_i"),
                       on="u", how="left")
                 .select("u", (F.col("sw")
                               + F.coalesce(F.col("_i"), F.lit(0)))
                         .alias("sw")).localCheckpoint())
        adj = inter.localCheckpoint()
        if adj.isEmpty():
            break
    # canonical labels: min ORIGINAL member node per community
    canon = mapping.groupBy("comm").agg(F.min("node").alias("community"))
    return (mapping.join(canon, on="comm")
            .select("node", "community"))


def biased_random_walks(
    edges: DataFrame,
    walk_len: int = 3,
    p: float = 1.0,
    q: float = 1.0,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """node2vec-style SECOND-ORDER biased walks (Grover & Leskovec
    2016): one walk per distinct source node, walk_len steps; the next
    hop is weighted by alpha = 1/p when it returns to the previous
    node, 1 when it stays in the previous node's neighborhood
    (triangle step), 1/q otherwise (exploration). p > 1 discourages
    backtracking (DFS-ish), q < 1 encourages outward exploration.
    Returns (walk_id, step, node); the first step is uniform (no
    previous node yet); sink nodes end their walk.

    Determinism without RNG state: the weighted choice is the
    Efraimidis-Spirakis one-draw trick — key = u ^ (1/alpha) with
    u = md5(walk|step|candidate) mapped to (0, 1]; argmax(key) picks
    candidate with probability proportional to alpha. Both the md5
    uniform and the 9dp-rounded pow are cross-engine reproducible
    (the text_sample_weighted recipe), so the DuckDB unrolled-CTE
    oracle hash-matches the whole corpus.

    Per step: frontier-to-edges join on the current node + ONE
    left join against the (prev, candidate) edge set for the
    triangle flag + a per-walk argmax window — all keyed operations,
    frontier localCheckpointed; same hot-hub story as random_walks
    (AQE skew split on the join, per-walk aggregate after)."""
    e = edges.select(F.col(src).alias("_es"),
                     F.col(dst).alias("_ed")).localCheckpoint()
    nbr = e.distinct().select(F.col("_es").alias("prev"),
                              F.col("_ed").alias("w"),
                              F.lit(True).alias("_tri"))
    frontier = (e.select(F.col("_es").alias("walk_id")).distinct()
                .select("walk_id",
                        F.lit(None).cast("string").alias("prev"),
                        F.col("walk_id").alias("node")))
    walks = frontier.select("walk_id", F.lit(0).alias("step"), "node")
    from pyspark.sql.window import Window
    win = Window.partitionBy("walk_id").orderBy(
        F.col("key").desc(), F.col("w").asc())
    for step in range(1, walk_len + 1):
        cand = (frontier.join(e, frontier["node"] == e["_es"])
                .select("walk_id", "prev",
                        F.col("node").alias("cur"),
                        F.col("_ed").alias("w")))
        cand = cand.join(F.broadcast(nbr), on=["prev", "w"],
                         how="left")
        u = (F.conv(F.substring(
            F.md5(F.concat_ws("|", F.col("walk_id"),
                              F.lit(str(step)), F.col("w"))),
            1, 12), 16, 10).cast("double") + F.lit(1.0)) \
            / F.pow(F.lit(2.0), F.lit(48.0))
        expo = (F.when(F.col("prev").isNull(), F.lit(1.0))
                .when(F.col("w") == F.col("prev"), F.lit(float(p)))
                .when(F.col("_tri"), F.lit(1.0))
                .otherwise(F.lit(float(q))))
        nxt = (cand.withColumn("key", F.round(F.pow(u, expo), 9))
               .withColumn("_rn", F.row_number().over(win))
               .where(F.col("_rn") == 1)
               .select("walk_id", F.col("cur").alias("prev"),
                       F.col("w").alias("node"))).localCheckpoint()
        walks = walks.unionByName(
            nxt.select("walk_id", F.lit(step).alias("step"), "node"))
        frontier = nxt
    return walks


def weighted_pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    damping: float = 0.85,
    iters: int = 3,
    precision: int = 8,
) -> DataFrame:
    """PageRank with EDGE WEIGHTS: each node's rank flows to its
    out-neighbors proportionally to edge weight (contribution
    r * w / W_out instead of r / out-degree). This is the
    entity-salience score the KG pipeline actually wants: the link
    stage accrues mention FREQUENCIES per entity edge, and a
    celebrity entity linked 10^6 times should pull more rank than a
    once-linked one — plain pagerank treats both edges identically.

    Same determinism contract and plan shape as pagerank (per-
    iteration round to `precision`, engine-side constants, dangling
    mass redistributed uniformly, localCheckpoint per round, the only
    broadcasts are 1-row scalars); weights are exact longs summed
    into the out-weight table once up front. The DuckDB unrolled-CTE
    oracle (kg_pagerank_weighted) hash-matches."""
    p = _loop_partitions(edges, edges.count())
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"),
                     F.col(weight).cast("long").alias("w")) \
        .localCheckpoint()
    nodes = (e.select(F.col("src").alias("node"))
             .union(e.select(F.col("dst").alias("node")))
             .distinct())
    nodes = partitioned_checkpoint(nodes.repartition(p, "node"))
    wd = e.groupBy("src").agg(F.sum("w").alias("wt"))
    # static out-weight pre-joined onto the edges once; loop joins only
    # the V-row rank frame against this checkpointed partitioning
    ew = partitioned_checkpoint(e.join(wd, on="src")
                                .repartition(p, "src"))
    danglers = partitioned_checkpoint(
        nodes.join(wd.withColumnRenamed("src", "node"),
                   on="node", how="left_anti"))
    n = nodes.count()  # exact int driver fold, see pagerank
    if n == 0:
        return nodes.select("node", F.lit(0.0).alias("rank"))
    nn = F.lit(n)

    one_minus_d = F.lit(1.0) - F.lit(damping)
    ranks = (nodes
             .select("node",
                     F.round(F.lit(1.0) / nn, precision)
                     .alias("r")))
    for _ in range(iters):
        contrib = (
            ranks.join(ew, ranks["node"] == ew["src"])
            .select("dst",
                    (F.col("r") * F.col("w") / F.col("wt"))
                    .alias("_c"))
            .groupBy("dst").agg(F.sum("_c").alias("c")))
        dangling = (ranks.join(danglers, on="node", how="left_semi")
                    .agg(F.coalesce(F.sum("r"), F.lit(0.0))
                         .alias("dm")))
        ranks = partitioned_checkpoint(
            _finish_rank(nodes, nn, dangling, contrib, one_minus_d,
                         damping, precision))
    return ranks.select("node", F.col("r").alias("rank"))


def hop_plot(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_depth: int = 32,
) -> DataFrame:
    """Hop plot of the directed graph: for each distance d >= 1, the
    number of ordered reachable pairs at exactly d hops, the running
    total, and the reachable-pair fraction — the curve whose 0.9
    crossing is the EFFECTIVE DIAMETER (the standard small-world
    scale diagnostic; read it off the first row with frac >= 0.9).
    Returns (dist, n_pairs, cum_pairs, frac) with exact longs and a
    6dp fraction.

    Reuses the all-sources BFS state (betweenness/closeness); the
    per-distance rollup is one map-side-combined aggregate, and the
    cumulative window runs over <= diameter rows — a bounded
    single-partition window by construction, not a scale hazard."""
    from pyspark.sql.window import Window

    e = (edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
         .where(F.col("src") != F.col("dst"))
         .distinct().localCheckpoint())
    nodes = (e.select(F.col("src").alias("node"))
             .unionByName(e.select(F.col("dst").alias("node")))
             .distinct().localCheckpoint())
    state = _bfs_sigma(e, nodes, max_depth)
    per_d = (state.where(F.col("dist") > 0)
             .groupBy("dist")
             .agg(F.count(F.lit(1)).alias("n_pairs")))
    w = Window.orderBy("dist").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    tot = Window.orderBy("dist").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    return (per_d
            .withColumn("cum_pairs", F.sum("n_pairs").over(w))
            .withColumn("frac",
                        F.round(F.col("cum_pairs")
                                / F.sum("n_pairs").over(tot), 6))
            .select("dist", "n_pairs", "cum_pairs", "frac"))


def k_truss(
    edges: DataFrame,
    k: int = 4,
    rounds: int = 3,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Bounded-round k-truss peel of the undirected graph: repeatedly
    drop edges supported by fewer than k-2 triangles among the
    SURVIVORS. Returns the surviving canonical edges with their
    support on the returned subgraph — (a, b, support). Edge-level
    cohesion: a k-truss edge sits in a community fabric, a bridge
    does not, which is a sharper community filter than k-core's
    degree test (every k-truss is inside the (k-1)-core).

    Same bounded-round contract as k_core: after `rounds` peels the
    survivors are a SUPERSET of the true k-truss unless the loop hit
    a fixpoint first (it exits early when no edge drops — then the
    result is exact; the cascade test pins this). Per round: one
    degree-ordered triangle enumeration over the survivors (the
    sqrt(m) wedge cap from triangle_count — celebrity nodes cannot
    blow up the wedge join), a 3-pairs explode + map-side-combined
    support count, one edge semi-join; localCheckpoint truncates
    lineage; the only driver action is the bounded per-round edge
    count for the fixpoint check."""
    a, b = F.least(F.col(src), F.col(dst)), F.greatest(F.col(src),
                                                       F.col(dst))
    und = (edges.where(F.col(src) != F.col(dst))
           .select(a.alias("a"), b.alias("b")).distinct()
           .localCheckpoint())

    def _support(e: DataFrame) -> DataFrame:
        tris = _closed_triangles(e, "a", "b")
        pair = F.explode(F.array(
            F.struct(F.least("wu", "v1").alias("a"),
                     F.greatest("wu", "v1").alias("b")),
            F.struct(F.least("wu", "v2").alias("a"),
                     F.greatest("wu", "v2").alias("b")),
            F.struct(F.least("v1", "v2").alias("a"),
                     F.greatest("v1", "v2").alias("b")))).alias("e")
        return (tris.select(pair)
                .select(F.col("e.a").alias("a"), F.col("e.b").alias("b"))
                .groupBy("a", "b")
                .agg(F.count(F.lit(1)).alias("support")))

    n = und.count()
    for _ in range(rounds):
        sup = _support(und)
        nxt = (und.join(sup, on=["a", "b"])
               .where(F.col("support") >= k - 2)
               .select("a", "b").localCheckpoint())
        m = nxt.count()
        und = nxt
        if m == n:
            break  # fixpoint: the result is the EXACT k-truss
        n = m
    return (und.join(_support(und), on=["a", "b"], how="left")
            .select("a", "b",
                    F.coalesce(F.col("support"), F.lit(0))
                    .cast("long").alias("support")))


def eccentricity(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_depth: int = 32,
) -> DataFrame:
    """Directed eccentricity per node: the max BFS distance to any
    reachable node (0 for sinks). Returns (node, n_reachable, ecc);
    min over non-sink rows is the graph RADIUS, max is the DIAMETER —
    the exact companions to hop_plot's effective (90th-pct) diameter.
    Same all-pairs BFS state as betweenness/closeness; one aggregate."""
    e = (edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
         .where(F.col("src") != F.col("dst"))
         .distinct().localCheckpoint())
    nodes = (e.select(F.col("src").alias("node"))
             .unionByName(e.select(F.col("dst").alias("node")))
             .distinct().localCheckpoint())
    state = _bfs_sigma(e, nodes, max_depth)
    per = (state.where(F.col("dist") > 0)
           .groupBy(F.col("s").alias("node"))
           .agg(F.count(F.lit(1)).alias("n_reachable"),
                F.max("dist").alias("ecc")))
    return (nodes.join(per, on="node", how="left")
            .select("node",
                    F.coalesce("n_reachable", F.lit(0)).cast("long")
                    .alias("n_reachable"),
                    F.coalesce("ecc", F.lit(0)).cast("long")
                    .alias("ecc")))


def _driver_simrank(e: DataFrame, rows, c: float, iters: int,
                    precision: int, eps: float) -> DataFrame:
    """SimRank over a collected (distinct, hub-capped) edge list —
    the small-graph fast path. Replicates the frame loop's arithmetic
    exactly: per-pair contributions are HALF_UP-gridded to 1e9-unit
    longs (so the t sums are EXACT integers, order-free), the update
    is c * (t/1e9) / (din_a * din_b) rounded HALF_UP to `precision`,
    and the eps cut applies to the rounded value. Row-identical to the
    distributed loop (pinned in tests)."""
    from pyspark.sql.types import DoubleType, StructField, StructType

    spark = e.sparkSession
    ntype = e.schema[0].dataType
    out_schema = StructType([
        StructField("a", ntype), StructField("b", ntype),
        StructField("s", DoubleType()),
    ])
    out_edges: dict = {}
    din: dict = {}
    nodes = set()
    for u, v in rows:
        out_edges.setdefault(u, []).append(v)
        din[v] = din.get(v, 0) + 1
        nodes.add(u)
        nodes.add(v)
    if not nodes:
        return spark.createDataFrame([], out_schema)
    pairs = {(v, v): 1.0 for v in nodes}
    for _ in range(iters):
        t: dict = {}
        for (a, b), sv in pairs.items():
            su = int(_round_half_up_dp(sv * 1e9, 0))
            for _a in out_edges.get(a, ()):
                for _b in out_edges.get(b, ()):
                    if _a != _b:
                        k = (_a, _b)
                        t[k] = t.get(k, 0) + su
        upd = {}
        for (_a, _b), tu in t.items():
            sp = _round_half_up_dp(
                c * (tu / 1e9) / (din[_a] * din[_b]), precision)
            if sp >= eps:
                upd[(_a, _b)] = sp
        pairs = {(v, v): 1.0 for v in nodes}
        pairs.update(upd)
    out = sorted((a, b, s) for (a, b), s in pairs.items() if a < b)
    return spark.createDataFrame(out, out_schema)


def simrank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    c: float = 0.8,
    iters: int = 2,
    precision: int = 9,
    eps: float = 1e-4,
    hub_cap: int | None = None,
    driver_threshold: int = 2000,
) -> DataFrame:
    """SimRank (Jeh & Widom 2002) node-pair similarity over the
    directed edge set: two nodes are similar when their IN-neighbors
    are similar, s(a,a) = 1 and
    s(a,b) = c / (|I(a)||I(b)|) * sum_{u in I(a), v in I(b)} s(u, v).
    Returns the non-trivial half-matrix (a, b, s) with a < b and
    s >= eps after `iters` bounded iterations — "entities cited by
    the same entities", the structural-equivalence companion to
    adamic_adar's shared-neighbor link prediction.

    Determinism / cross-engine parity (the pagerank recipe): the pair
    frame starts from the exact diagonal, every iterated value is
    rounded to `precision` dp per round, and the eps cut is applied to
    the ROUNDED value — the DuckDB oracle (kg_simrank) unrolls the
    same iterations as CTEs and hash-matches.

    Scale shape: the pair frame holds ONLY pairs reachable from the
    diagonal with similarity >= eps (the standard threshold-pruned
    SimRank — exact for every surviving pair because dropped entries
    could only contribute < eps * c per round). Each iteration is two
    joins against the STATIC checkpointed out-edge frame (pair-side
    repartitioned on the first key to reuse the edge partitioning) +
    one map-side-combined (a, b) aggregate + one in-degree join. The
    quadratic danger is hub fan-out — a node with out-degree d mints
    d^2 candidate pairs from the diagonal; `hub_cap` drops SOURCES
    with out-degree > cap from pair generation (the observable-cap
    philosophy of dedup's LSH buckets: at web scale you cap the
    celebrity hubs and count what you dropped via a degree groupBy
    before raising the cap). The fan-out exchange is pinned against
    AQE's byte-based coalescing (skew.pin_fanout_partitions).
    """
    from mms_rdf_spark.operators.skew import pin_fanout_partitions

    e = (edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
         .distinct().localCheckpoint())
    # loop state frames sized from the edge count (the pair frame can
    # outgrow this at high fan-out, but its generating join is pinned
    # at full width by pin_fanout_partitions below — only the
    # carried state repartitions use p)
    n_edges = e.count()
    p = _loop_partitions(e, n_edges)
    if hub_cap is not None:
        outd = e.groupBy("src").agg(F.count(F.lit(1)).alias("_od"))
        big = outd.where(F.col("_od") > hub_cap).select("src")
        e = e.join(F.broadcast(big), on="src", how="left_anti") \
            .localCheckpoint()
    if n_edges <= driver_threshold:
        # small-graph fold (row-identical; see _driver_simrank). The
        # threshold is deliberately LOW — the Python loop's work is
        # quadratic in pair fan-out, not edges, so only toy graphs
        # qualify; eps pruning keeps those loops in the ~1e5-op range.
        rows = [(r["src"], r["dst"]) for r in e.collect()]
        if all(u is not None and v is not None for u, v in rows):
            return _driver_simrank(e, rows, c, iters, precision, eps)
    nodes = (e.select(F.col("src").alias("node"))
             .unionByName(e.select(F.col("dst").alias("node")))
             .distinct())
    nodes = partitioned_checkpoint(nodes.repartition(p, "node"))
    if nodes.count() == 0:
        return nodes.select(F.col("node").alias("a"),
                            F.col("node").alias("b"),
                            F.lit(0.0).alias("s"))
    din = partitioned_checkpoint(
        e.groupBy(F.col("dst").alias("node"))
        .agg(F.count(F.lit(1)).alias("d")).repartition(p, "node"))
    e1 = partitioned_checkpoint(
        e.select(F.col("src").alias("_u"), F.col("dst").alias("_a"))
        .repartition(p, "_u"))
    e2 = e.select(F.col("src").alias("_v"), F.col("dst").alias("_b"))
    # diag stays a LAZY projection of the checkpointed node frame: a
    # frame whose a and b are duplicate aliases of one column captures
    # its partitioning canonicalized onto the LAST alias (hash(b)),
    # so checkpointing it would lose hash(a) and re-exchange the seed
    # round's pair join (the cc.py bare-frame + lazy-alias recipe;
    # plan-pinned in test_pagerank_plan.py). Union rounds are immune —
    # post-union attributes are no longer provably equal.
    diag = nodes.select(F.col("node").alias("a"),
                        F.col("node").alias("b"),
                        F.lit(1.0).alias("s"))
    s = diag
    for _ in range(iters):
        t = (s.join(e1, s["a"] == F.col("_u"))
             .select(F.col("_a"), F.col("b"), F.col("s")))
        t = pin_fanout_partitions(t, "b")
        # sums of 9dp-gridded similarities are GRID-ALIGNED — float
        # summation order would flip the rounded digit between engines
        # (the NOTES micro-unit rule): accumulate exact 1e9-unit longs
        t = (t.join(e2, t["b"] == F.col("_v"))
             .where(F.col("_a") != F.col("_b"))
             .groupBy("_a", "_b")
             .agg(F.sum(F.round(F.col("s") * 1e9).cast("long"))
                  .alias("_t")))
        upd = (t.join(din.select(F.col("node").alias("_a"),
                                 F.col("d").alias("_da")), on="_a")
               .join(din.select(F.col("node").alias("_b"),
                                F.col("d").alias("_db")), on="_b")
               .select(F.col("_a").alias("a"), F.col("_b").alias("b"),
                       F.round(F.lit(c) * (F.col("_t") / F.lit(1e9))
                               / (F.col("_da") * F.col("_db")),
                               precision).alias("s"))
               .where(F.col("s") >= eps))
        s = partitioned_checkpoint(
            diag.unionByName(upd).repartition(p, "a"))
    return (s.where(F.col("a") < F.col("b"))
            .select("a", "b", "s"))


def maximal_independent_set(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    rounds: int = 3,
    nodes: DataFrame | None = None,
) -> DataFrame:
    """Luby-style maximal independent set over the undirected graph:
    each round, a remaining node joins the MIS iff its priority beats
    every remaining neighbor's; selected nodes and their neighbors
    leave the pool. Returns (node, state, round) — 'mis' rows with
    their selection round, plus any 'undecided' survivors (round 0)
    if the bounded loop ran out before the pool drained (Luby drains
    in O(log n) rounds w.h.p.; the early-exit fires when the pool
    empties, and at fixpoint the MIS is exact and maximal — pinned in
    tests). MIS is the classic symmetry-breaking primitive (greedy
    coloring seeds, landmark selection, parallel scheduling).

    Determinism: priority = md5(node) || '#' || node — stable across
    runs/engines and totally ordered (the '#node' suffix makes ties
    impossible even under hash collision), never RNG state. The
    DuckDB oracle (kg_mis) unrolls the same rounds.

    Scale shape: per round ONE neighbor-min aggregate over the
    remaining edge set (map-side combined — a celebrity node's
    priorities partial-aggregate) + two anti-joins; the symmetric
    edge frame is checkpointed once and shrunk each round so later
    rounds touch only the surviving subgraph; localCheckpoint per
    round truncates lineage; the only driver action is the bounded
    per-round pool count.
    """
    p = _loop_partitions(edges, edges.count())
    sym = (edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
           .where(F.col("src") != F.col("dst")))
    sym = (sym.unionByName(sym.select(F.col("dst").alias("src"),
                                      F.col("src").alias("dst")))
           .distinct())
    sym = partitioned_checkpoint(sym.repartition(p, "src"))
    if nodes is None:
        nodes = (edges.select(F.col(src).alias("node"))
                 .unionByName(edges.select(F.col(dst).alias("node")))
                 .distinct())
    else:
        # explicit node set (greedy_coloring passes the uncolored
        # pool): adjacency still comes from `edges`, restricted by
        # the live semi-joins below to pool-pool edges
        nodes = nodes.select("node").distinct()
    pool = partitioned_checkpoint(
        nodes.select("node",
                     F.concat(F.md5("node"), F.lit("#"), F.col("node"))
                     .alias("pr"))
        .repartition(p, "node"))
    spark = edges.sparkSession
    out = spark.createDataFrame([], "node string, state string, round int")
    n = pool.count()
    for r in range(1, rounds + 1):
        if n == 0:
            break
        live = (sym.join(pool.select(F.col("node").alias("src")),
                         on="src", how="left_semi")
                .join(pool.select(F.col("node").alias("dst")),
                      on="dst", how="left_semi"))
        nbr_min = (live.join(pool.select(F.col("node").alias("dst"),
                                         F.col("pr").alias("_npr")),
                             on="dst")
                   .groupBy("src").agg(F.min("_npr").alias("_nm")))
        sel = (pool.join(nbr_min.withColumnRenamed("src", "node"),
                         on="node", how="left")
               .where(F.col("_nm").isNull()
                      | (F.col("pr") < F.col("_nm")))
               .select("node").localCheckpoint())
        covered = (live.join(sel.withColumnRenamed("node", "src"),
                             on="src", how="left_semi")
                   .select(F.col("dst").alias("node")).distinct())
        out = out.unionByName(
            sel.select("node", F.lit("mis").alias("state"),
                       F.lit(r).alias("round")))
        pool = partitioned_checkpoint(
            pool.join(sel, on="node", how="left_anti")
            .join(covered, on="node", how="left_anti")
            .repartition(p, "node"))
        n = pool.count()
    return out.unionByName(
        pool.select("node", F.lit("undecided").alias("state"),
                    F.lit(0).alias("round")))


def greedy_coloring(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_colors: int = 8,
    mis_rounds: int = 3,
) -> DataFrame:
    """Distributed greedy graph coloring by iterated Luby MIS
    (Jones-Plassmann family): color c goes to a maximal independent
    set of the still-uncolored subgraph, so every color class is
    independent by construction — a PROPER coloring of everything
    colored. Returns (node, color) with color >= 1; nodes still
    uncolored when `max_colors` runs out come back with color 0
    (observable leftover, never a silent drop). Coloring is the
    classic conflict-free scheduling primitive: same-color entities
    can be processed in one parallel wave with no shared edge.

    Determinism: inherits maximal_independent_set's md5 priorities —
    bit-stable across runs and engines. The contract row
    (kg_coloring_cert) is SELF-CERTIFYING in the louvain style: ok =
    zero monochromatic edges AND zero uncolored nodes, paired with
    the exact edge count — a regression flips the hash.

    Scale shape: each color round is one bounded MIS over the
    surviving pool (the pool only shrinks); the symmetric edge frame
    is built once per round from the same checkpointed base. Nested
    loop depth is max_colors * mis_rounds — both small constants, and
    greedy-MIS coloring needs ~(max degree + 1) colors, so max_colors
    tracks the degree bound, not the graph size."""
    sym = (edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
           .where(F.col("src") != F.col("dst")))
    nodes = (edges.select(F.col(src).alias("node"))
             .unionByName(edges.select(F.col(dst).alias("node")))
             .distinct())
    sym = sym.localCheckpoint()
    pool = nodes.localCheckpoint()
    spark = edges.sparkSession
    out = spark.createDataFrame([], "node string, color int")
    remaining = pool.count()
    for c in range(1, max_colors + 1):
        if remaining == 0:
            break
        res = maximal_independent_set(sym, rounds=mis_rounds,
                                      nodes=pool)
        colored = (res.where(F.col("state") == "mis")
                   .select("node", F.lit(c).alias("color"))
                   .localCheckpoint())
        out = out.unionByName(colored)
        pool = pool.join(colored.select("node"), on="node",
                         how="left_anti").localCheckpoint()
        remaining = pool.count()
    return out.unionByName(
        pool.select("node", F.lit(0).alias("color")))


def boruvka_mst(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    rounds: int = 5,
) -> DataFrame:
    """Borůvka minimum spanning forest over the weighted undirected
    graph — THE textbook bulk-synchronous graph algorithm: each round
    every component picks its cheapest outgoing edge under the TOTAL
    order (w, a, b), the picked edges join the forest, and touched
    components merge; components at least halve per round, so
    `rounds` ~ log2(V) suffices (early exit at spanning). Returns the
    forest edges (a, b, w) with a < b. MSTs are the backbone of
    single-linkage clustering and network-cost planning; HDBSCAN at
    corpus scale is exactly an MST over a mutual-reachability graph.

    Determinism: the (w, a, b) lexicographic tiebreak makes the
    picked forest UNIQUE even under duplicate weights (equivalent to
    an infinitesimal perturbation — the same forest Kruskal picks
    under the same order; pinned bit-for-bit against a pure-Python
    Kruskal twin in tests). Parallel edges collapse to their min
    weight (same tiebreak) first.

    Scale shape: per round ONE join of the surviving cross-component
    edge set against the component labels (both sides repartitioned
    on their keys), one map-side-combined min-struct aggregate per
    component (a celebrity component partial-aggregates), and a
    connected-components pass over the PICKED edges only (≤ one edge
    per component — the merge graph is component-sized, not
    edge-sized); localCheckpoint per round; the only driver action is
    the bounded per-round cross-edge count."""
    from mms_rdf_spark.operators.cc import connected_components

    p = _loop_partitions(edges, edges.count())
    a, b = F.least(F.col(src), F.col(dst)), F.greatest(F.col(src),
                                                       F.col(dst))
    und = (edges.where(F.col(src) != F.col(dst))
           .select(a.alias("a"), b.alias("b"),
                   F.col(weight).alias("w"))
           .groupBy("a", "b")
           .agg(F.min(F.struct("w", "a", "b")).alias("_m"))
           .select("a", "b", F.col("_m.w").alias("w")))
    und = partitioned_checkpoint(und.repartition(p, "a"))
    nodes = (und.select(F.col("a").alias("node"))
             .unionByName(und.select(F.col("b").alias("node")))
             .distinct())
    comp = partitioned_checkpoint(
        nodes.select("node", F.col("node").alias("c"))
        .repartition(p, "node"))
    spark = edges.sparkSession
    forest = spark.createDataFrame(
        [], "a string, b string, w double")
    for _ in range(rounds):
        lab = (und
               .join(comp.select(F.col("node").alias("a"),
                                 F.col("c").alias("_ca")), on="a")
               .join(comp.select(F.col("node").alias("b"),
                                 F.col("c").alias("_cb")), on="b")
               .where(F.col("_ca") != F.col("_cb"))
               .localCheckpoint())
        if lab.count() == 0:
            break  # spanning forest complete
        pick = (lab.select(F.col("_ca").alias("_c"),
                           F.struct("w", "a", "b").alias("_e"))
                .unionByName(
                    lab.select(F.col("_cb").alias("_c"),
                               F.struct("w", "a", "b").alias("_e")))
                .groupBy("_c").agg(F.min("_e").alias("_e"))
                .select(F.col("_e.a").alias("a"),
                        F.col("_e.b").alias("b"),
                        F.col("_e.w").alias("w"))
                .distinct().localCheckpoint())
        forest = forest.unionByName(pick).localCheckpoint()
        merge = (pick
                 .join(comp.select(F.col("node").alias("a"),
                                   F.col("c").alias("_ca")), on="a")
                 .join(comp.select(F.col("node").alias("b"),
                                   F.col("c").alias("_cb")), on="b")
                 .select(F.col("_ca").alias("src"),
                         F.col("_cb").alias("dst")))
        relab = connected_components(merge, "src", "dst")
        comp = partitioned_checkpoint(
            comp.join(relab.withColumnRenamed("node", "c"),
                      on="c", how="left")
            .select("node",
                    F.coalesce("component", F.col("c")).alias("c"))
            .repartition(p, "node"))
    return forest.select("a", "b", "w")


def seeded_label_propagation(
    edges: DataFrame,
    seeds: DataFrame,
    iters: int = 2,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node",
    label_col: str = "label",
) -> DataFrame:
    """Semi-supervised node classification by seeded label propagation
    (Zhu & Ghahramani 2002, hard-clamp variant): seed nodes keep their
    label forever; every other node adopts, each synchronous round,
    the most frequent label among its CURRENTLY-labeled neighbors
    (ties broken label-ascending — deterministic); nodes no labeled
    neighbor has reached stay unlabeled. Bounded `iters` rounds (the
    classification analog of label_propagation above, which seeds
    every node with itself for community detection).

    Returns (node, label, is_seed) for every node that HAS a label
    after the final round.

    Scale shape: per round, one message join (labels x both edge
    directions), one (node, label) count aggregate, one argmax window
    over label-count rows (each node owns its distinct-neighbor-label
    rows only); labels are localCheckpointed per round so the lineage
    stays round-deep, not geometric.
    """
    from pyspark.sql.window import Window

    und = (edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
           .unionByName(edges.select(F.col(dst).alias("u"),
                                     F.col(src).alias("v")))
           .distinct().localCheckpoint())
    # conflicting seed labels for one node resolve to the min label
    # (deterministic; ill-formed input, not silently doubled)
    seed_t = (seeds.select(F.col(node_col).alias("node"),
                           F.col(label_col).alias("label"))
              .groupBy("node").agg(F.min("label").alias("label"))
              .localCheckpoint())
    labels = seed_t
    w = Window.partitionBy("node").orderBy(
        F.col("cnt").desc(), F.col("label").asc())
    for _ in range(iters):
        msgs = (und.join(labels.withColumnRenamed("node", "u"),
                         on="u")
                .select(F.col("v").alias("node"), "label"))
        counts = (msgs.groupBy("node", "label")
                  .agg(F.count(F.lit(1)).alias("cnt")))
        argmax = (counts.withColumn("_rn", F.row_number().over(w))
                  .where(F.col("_rn") == 1)
                  .select("node", "label"))
        labels = (seed_t.unionByName(
            argmax.join(seed_t.select("node"), on="node",
                        how="left_anti"))
            .localCheckpoint())
    return labels.join(
        seed_t.select("node", F.lit(True).alias("is_seed")),
        on="node", how="left").na.fill({"is_seed": False}) \
        .select("node", "label", "is_seed")


def link_prediction_scores(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_deg: int | None = None,
    ndigits: int = 6,
) -> DataFrame:
    """The classic shared-neighbor link-prediction baselines in ONE
    mediator pass (Liben-Nowell & Kleinberg 2003), complementing
    adamic_adar: for every pair (a < b) sharing >=1 kept mediator,
    cn      = |Γ(a) ∩ Γ(b)|            (common neighbors, long)
    jaccard = cn / |Γ(a) ∪ Γ(b)|
    ra      = Σ_z 1/deg(z)             (resource allocation)
    pa      = deg(a) * deg(b)          (preferential attachment, long)
    Returns (a, b, cn, jaccard, ra, pa).

    Scale shape: identical to adamic_adar — pairs generated per
    mediator z (cost Σ deg(z)²), `max_deg` drops super-hub mediators
    (their pair volume is the bill, their 1/deg weight is noise), and
    the z self-join is pinned against AQE's fan-out-blind coalescing
    (skew.pin_fanout_partitions). Capping affects cn/jaccard/ra
    consistently (all three count only KEPT mediators — documented
    hybrid); endpoint degrees for jaccard's union and pa are the FULL
    degrees (endpoint properties, not mediator ones). Determinism: cn
    and pa are exact longs; ra sums integer micro-unit weights; the
    jaccard division is a single first-generation double op.
    """
    from mms_rdf_spark.operators.skew import pin_fanout_partitions

    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = (e.union(e.select(F.col("b"), F.col("a")))
           .where(F.col("a") != F.col("b")).distinct())
    deg = sym.groupBy(F.col("a").alias("z")) \
        .agg(F.count(F.lit(1)).alias("d"))
    keep = deg.where(F.col("d") >= 2)
    if max_deg is not None:
        keep = keep.where(F.col("d") <= max_deg)
    ra_mu = F.round(F.lit(1e6) / F.col("d")).cast("long")
    nbrs = (sym.select(F.col("a").alias("z"), F.col("b").alias("n"))
            .join(F.broadcast(keep.withColumn("_w", ra_mu)
                              .select("z", "_w")), on="z"))
    nbrs = pin_fanout_partitions(nbrs, "z")
    x = nbrs.select("z", F.col("n").alias("pa"), "_w")
    y = nbrs.select("z", F.col("n").alias("pb"))
    pairs = (x.join(y, on="z")
             .where(F.col("pa") < F.col("pb"))
             .groupBy(F.col("pa").alias("a"), F.col("pb").alias("b"))
             .agg(F.count(F.lit(1)).alias("cn"),
                  F.sum("_w").alias("_ra_mu")))
    da = deg.select(F.col("z").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("z").alias("b"), F.col("d").alias("db"))
    return (pairs.join(da, on="a").join(db, on="b")
            .select(
                "a", "b",
                F.col("cn").cast("long").alias("cn"),
                F.round(F.col("cn") / (F.col("da") + F.col("db")
                                       - F.col("cn")),
                        ndigits).alias("jaccard"),
                F.round(F.col("_ra_mu") / 1e6, ndigits).alias("ra"),
                (F.col("da") * F.col("db")).cast("long").alias("pa")))


def square_counts(edges: DataFrame, src: str = "src",
                  dst: str = "dst") -> DataFrame:
    """Per-node 4-cycle (square) participation counts over the
    undirected simple graph — the bipartite-ish cohesion signal
    triangles miss (co-purchase and interaction graphs are
    square-rich even where triangle-sparse). For each unordered pair
    of distinct opposite vertices {u, w}, C(cn(u,w), 2) squares run
    through them (cn = common-neighbor count); a square u-a-w-b gives
    u a UNIQUE opposite vertex w, so

        squares(u) = sum_w C(cn(u, w), 2)

    counts each square through u exactly once (global count =
    sum/4). Returns (node, squares) for nodes on >= 1 square.

    Plan: symmetrize + distinct the edge list, self-join on the
    middle vertex to enumerate wedges (u, x, w) for u < w ONLY (each
    unordered opposite pair aggregates once — the u<w filter sits
    BEFORE the codegree exchange, halving the dominant shuffle,
    measured 2x at sf0.1's 298M-wedge graph), count by endpoints,
    one exact comb-sum, then explode the contribution to both
    endpoints — all integer arithmetic, so the oracle's naive
    enumeration must agree. Requires a totally ordered node id type
    (longs/strings both fine). Scale: the wedge step is
    sum_x deg(x)^2 / 2 — the classic hub hazard; the self-join is
    pinned by pin_fanout_partitions (wedge rows are bytes-small but
    fan out quadratically per hub, exactly the AQE blind spot
    measured at the round-5 scale point), and the codegree count is
    map-side combined. A degree cap on x (Chiba-Nishizeki vertex
    ordering) is the documented next knob if a real corpus has
    10^6-degree hubs."""
    from mms_rdf_spark.operators.skew import pin_fanout_partitions

    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = (e.union(e.select(F.col("b").alias("a"),
                            F.col("a").alias("b")))
           .where(F.col("a") != F.col("b")).distinct())
    left = pin_fanout_partitions(
        sym.select(F.col("a").alias("u"), F.col("b").alias("x")), "x")
    right = pin_fanout_partitions(
        sym.select(F.col("a").alias("x"), F.col("b").alias("w")), "x")
    wedges = (left.join(right, on="x")
              .where(F.col("u") < F.col("w"))
              .groupBy("u", "w")
              .agg(F.count(F.lit(1)).alias("cn"))
              .where(F.col("cn") >= 2))
    return (wedges
            .select(F.explode(F.array("u", "w")).alias("node"),
                    F.expr("CAST(cn * (cn - 1) AS BIGINT) div 2")
                    .alias("pairs2"))
            .groupBy("node")
            .agg(F.sum("pairs2").cast("long").alias("squares")))


def peel_rounds(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    eps: float = 0.25,
    max_rounds: int = 64,
) -> DataFrame:
    """Charikar greedy densest-subgraph peel (Charikar 2000, batch
    form of Bahmani et al. VLDB 2012): repeatedly remove every node
    whose degree is <= (1+eps) times the CURRENT average degree,
    labeling each node with its removal round. The suffix sets
    S_t = {nodes removed at round >= t} are exactly the graphs the
    peel saw, so the densest of them is a 2(1+eps)-approximation of
    the densest subgraph — see density_profile / densest_subgraph.

    Returns (node, r): r = 0-based round at which the node left
    (nodes that lose their last edge without crossing the threshold
    leave the same round — alive \\ keep, not just below-threshold).

    Scale shape: each round is one map-side-combined degree
    aggregate + two semi-joins on the shrinking symmetric edge list
    (partitioned_checkpoint bounds lineage, k_core's discipline);
    per Markov at least an eps/(1+eps) fraction of nodes leaves per
    round, so rounds <= log(n)/log(1+eps) — the loop RAISES on
    max_rounds exhaustion rather than return a mislabeled prefix
    (the SCC loud-exhaustion precedent). Driver state per round is
    two bounded counts.

    Reference provenance: no analog in the reference (Node triple
    factory); beyond-reference graph suite.
    """
    if eps <= 0:
        raise ValueError("peel_rounds: eps must be > 0 (termination)")
    spark = edges.sparkSession
    p = _loop_partitions(edges, edges.count())
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    sym = partitioned_checkpoint(
        (e.union(e.select(F.col("dst"), F.col("src")))
         .where(F.col("src") != F.col("dst"))
         .distinct()).repartition(p, "src"))
    alive = sym.select(F.col("src").alias("node")).distinct() \
        .localCheckpoint()
    rem = None
    for r in range(max_rounds):
        n = alive.count()
        if n == 0:
            break
        m2 = sym.count()  # both orientations = 2m
        thresh = (1.0 + eps) * m2 / n  # (1+eps) * average degree
        deg = sym.groupBy(F.col("src").alias("node")) \
            .agg(F.count(F.lit(1)).alias("d"))
        keep = deg.where(F.col("d") > thresh).select("node") \
            .localCheckpoint()
        removed = (alive.join(keep, on="node", how="left_anti")
                   .select("node", F.lit(r).cast("int").alias("r")))
        rem = removed if rem is None else rem.unionByName(removed)
        rem = rem.localCheckpoint()
        alive = keep
        sym = partitioned_checkpoint(
            sym.join(keep.withColumnRenamed("node", "src"),
                     on="src", how="left_semi")
            .join(keep.withColumnRenamed("node", "dst"), on="dst",
                  how="left_semi")
            .select("src", "dst"))
    else:
        if alive.count() > 0:
            raise RuntimeError(
                f"peel_rounds: not empty after {max_rounds} rounds")
    if rem is None:
        return spark.createDataFrame([], "node long, r int")
    return rem


def density_profile(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    eps: float = 0.25,
    max_rounds: int = 64,
    rem: DataFrame | None = None,
) -> DataFrame:
    """Density of every peel suffix S_t (the graph alive entering
    round t): (t, n_nodes, n_edges, density) — t = 0 is the full
    graph. The best row is the 2(1+eps)-approximate densest
    subgraph; the classic argmax-over-suffixes trick means NO
    per-round snapshots: each edge's death round is
    min(r_u, r_v) and each suffix's counts are suffix sums of two
    <= max_rounds-row tables (a bounded driver fold). Pass a
    precomputed peel_rounds frame via `rem` to avoid re-peeling.
    """
    if rem is None:
        rem = peel_rounds(edges, src, dst, eps, max_rounds)
    e = (edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
         .where(F.col("a") != F.col("b"))
         .select(F.least("a", "b").alias("a"),
                 F.greatest("a", "b").alias("b")).distinct())
    ru = rem.withColumnRenamed("node", "a") \
        .withColumnRenamed("r", "ra")
    rv = rem.withColumnRenamed("node", "b") \
        .withColumnRenamed("r", "rb")
    et = (e.join(ru, on="a").join(rv, on="b")
          .select(F.least("ra", "rb").alias("t")))
    m_t = {row["t"]: row["m"] for row in
           et.groupBy("t").agg(F.count(F.lit(1)).alias("m"))
           .collect()}
    n_t = {row["r"]: row["n"] for row in
           rem.groupBy("r").agg(F.count(F.lit(1)).alias("n"))
           .collect()}
    rounds = sorted(set(m_t) | set(n_t))
    rows, mm, nn = [], 0, 0
    for t in reversed(rounds):
        mm += int(m_t.get(t, 0))
        nn += int(n_t.get(t, 0))
        rows.append((int(t), nn, mm, round(mm / nn, 6)))
    rows.reverse()
    spark = edges.sparkSession
    if not rows:
        return spark.createDataFrame(
            [], "t int, n_nodes long, n_edges long, density double")
    return spark.createDataFrame(
        rows, "t int, n_nodes long, n_edges long, density double")


def densest_subgraph(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    eps: float = 0.25,
    max_rounds: int = 64,
) -> DataFrame:
    """Node set of the densest peel suffix (max density, earliest t
    on ties): a 2(1+eps)-approximate densest subgraph. Returns
    (node,). Compose with density_profile for the numbers."""
    rem = peel_rounds(edges, src, dst, eps, max_rounds)
    prof = density_profile(edges, src, dst, eps, max_rounds, rem=rem)
    best = (prof.orderBy(F.col("density").desc(), F.col("t"))
            .limit(1).collect())
    if not best:
        return edges.sparkSession.createDataFrame([], "node long")
    t_star = best[0]["t"]
    return rem.where(F.col("r") >= t_star).select("node")
