"""Connected-components canonicalization (north-rule stage 3).

Iterative hash-min label propagation over an edge DataFrame: every
node's label converges to the minimum node id in its component. This
replaces the reference's implicit "same id => same IRI" identity plus
the ammend.js gap-fill with real entity resolution (SURVEY.md §4).

Scale design:
  - labels and edges are keyed DataFrames; each iteration is two
    equi-joins (edge + label) + one min-aggregate, all AQE-skew-
    splittable (hot entities = high-degree nodes).
  - the E-row edge table is repartitioned on its loop join key ONCE
    and checkpointed with `pagerank.partitioned_checkpoint` (AQE-safe
    partitioning capture); the V-row label frame is kept node-
    partitioned across rounds, so the per-round edge join runs with
    ZERO exchanges — edges are scanned and map-side partial-aggregated
    every round but never reshuffled. Only V-row frames move per
    iteration (plan-asserted in tests/test_pagerank_plan.py's sibling
    assertions for cc).
  - lineage truncated per iteration via localCheckpoint (required —
    without it the plan doubles every round and the driver OOMs on
    plan serialization long before data is a problem).
  - convergence = count of changed labels == 0; iterations bounded by
    component diameter, and the min-label short-circuits long chains
    quickly in practice (hash-min). max_iterations caps pathological
    chains; verified against a pathological chain graph in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _driver_union_find(spark: SparkSession, sym: DataFrame) -> DataFrame:
    """Union-find over a collected edge list (small-graph fast path)."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for row in sym.collect():
        a, b = row["a"], row["b"]
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    rows = [(n, find(n)) for n in parent]
    if not rows:
        return spark.createDataFrame([], "node string, component string")
    return spark.createDataFrame(rows, ["node", "component"])


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 50,
    driver_threshold: int = 200_000,
    encode: bool = False,
) -> DataFrame:
    """(src, dst) undirected edges -> (node, component) with component =
    min node id (string order) in the node's component.

    Small-graph fast path: below `driver_threshold` distinct edges the
    graph is collected and solved with union-find on the driver — the
    iterative Spark fixpoint costs several jobs per round, which at
    vocab/entity-table sizes is pure overhead. Above the threshold the
    distributed hash-min + pointer-jumping loop runs. Both paths are
    tested equivalent; the threshold is a conf knob, not a semantic.

    `encode=True` runs the distributed loop on dense long ids
    (pagerank's dictionary encoding). The hash-min semantics survive
    EXACTLY because global_rank is monotone in the node total order:
    min(rank) is attained at min(node), so the decoded component is the
    same string. Row-identical to the string path (pinned in tests);
    at IRI-width keys every loop shuffle moves 8-byte keys instead."""
    from mms_rdf_spark.operators.pagerank import (
        _loop_partitions,
        _node_dict,
        partitioned_checkpoint,
    )

    # both edge directions from ONE pass over the (possibly expensive)
    # edge lineage: the union-of-flip form evaluated `edges` twice —
    # for the linking composition that was the whole candidate-edge
    # pipeline re-run. explode(array(fwd, rev)) is row-equivalent.
    sym = (
        edges.select(F.explode(F.array(
            F.struct(F.col(src).alias("a"), F.col(dst).alias("b")),
            F.struct(F.col(dst).alias("a"), F.col(src).alias("b")),
        )).alias("_e"))
        .select(F.col("_e.a").alias("a"), F.col("_e.b").alias("b"))
        .where(F.col("a").isNotNull() & F.col("b").isNotNull())
        .distinct()
    )
    # plain checkpoint first: the driver fast path needs only a count
    # and a collect, so the keyed-partitioning capture (AQE off/on
    # round-trip + full-width repartition) is deferred to the
    # distributed path that actually loops on it
    sym = sym.localCheckpoint()
    n_edges = sym.count()
    if n_edges <= driver_threshold:
        return _driver_union_find(edges.sparkSession, sym)
    # loop join key is b: partition once (scale-adaptive count),
    # reuse every round
    p = _loop_partitions(sym, n_edges)
    sym = partitioned_checkpoint(sym.repartition(p, "b"))
    dict_df = None
    if encode:
        nodes_s = (sym.select(F.col("a").alias("node")).distinct())
        dict_df = _node_dict(nodes_s)
        sym = partitioned_checkpoint(
            sym.join(dict_df.select(F.col("node").alias("a"),
                                    F.col("nid").alias("_ea")), on="a")
            .join(dict_df.select(F.col("node").alias("b"),
                                 F.col("nid").alias("_eb")), on="b")
            .select(F.col("_ea").alias("a"), F.col("_eb").alias("b"))
            .repartition(p, "b"))
    # checkpoint the BARE node frame and alias component on top
    # lazily: with component==node inside the checkpointed plan the
    # top repartition is elided as redundant and the physical
    # partitioning becomes a PartitioningCollection, which the
    # checkpoint capture drops (measured: the loop join re-exchanged)
    nodes0 = partitioned_checkpoint(
        sym.select(F.col("a").alias("node"))
        .distinct()
        .repartition(p, "node")
    )
    labels = nodes0.withColumn("component", F.col("node"))
    for _ in range(max_iterations):
        # hash-min: candidate label = min over neighbors' labels + own
        # explicit join condition, NOT a rename-then-USING join: the
        # checkpointed hash partitioning does not propagate through a
        # withColumnRenamed projection in this Spark version, and the
        # rename form re-exchanged the E-row side every round
        neighbor_min = (
            sym.join(labels, sym["b"] == labels["node"])
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("component").alias("nbr_component"))
        )
        hashed = (
            labels.join(neighbor_min, on="node", how="left")
            .select(
                "node",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nbr_component"), F.col("component")),
                ).alias("component"),
            )
        )
        # pointer jumping: follow component -> its component once per
        # round, collapsing chains in O(log n) rounds instead of O(n)
        parents = hashed.select(F.col("node").alias("p_node"),
                                F.col("component").alias("p_component"))
        jumped = (
            hashed.join(parents, hashed.component == parents.p_node, "left")
            .select(
                "node",
                F.least(F.col("component"),
                        F.coalesce(F.col("p_component"), F.col("component"))
                        ).alias("component"),
            )
        )
        # the pointer-jump join leaves the frame component-partitioned;
        # re-key by node so next round's edge join stays exchange-free
        jumped = partitioned_checkpoint(jumped.repartition(p, "node"))
        changed = (
            jumped.alias("n").join(labels.alias("o"), on="node")
            .where(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = jumped
        if changed == 0:
            break
    if encode:
        # decode node AND component through the order-preserving dict
        labels = (
            labels.join(dict_df.select(F.col("nid").alias("node"),
                                       F.col("node").alias("_dn")),
                        on="node")
            .join(dict_df.select(F.col("nid").alias("component"),
                                 F.col("node").alias("_dc")),
                  on="component")
            .select(F.col("_dn").alias("node"),
                    F.col("_dc").alias("component")))
    return labels


# --- directed graphs: strongly connected components ------------------

def _tarjan_scc(spark: SparkSession, e: DataFrame) -> DataFrame:
    """Iterative Tarjan over a collected edge list (small-graph fast
    path, the union-find analog for the directed case). Component id =
    min node id in the SCC (deterministic, engine-portable)."""
    adj: dict[str, list[str]] = {}
    nodes: set[str] = set()
    for row in e.collect():
        a, b = row["a"], row["b"]
        nodes.add(a)
        nodes.add(b)
        adj.setdefault(a, []).append(b)
    index: dict[str, int] = {}
    low: dict[str, int] = {}
    on_stack: set[str] = set()
    stack: list[str] = []
    comp: dict[str, str] = {}
    counter = 0
    for start in sorted(nodes):
        if start in index:
            continue
        # explicit DFS stack: (node, iterator position)
        work = [(start, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter
                counter += 1
                stack.append(v)
                on_stack.add(v)
            succs = adj.get(v, [])
            advanced = False
            while pi < len(succs):
                w = succs[pi]
                pi += 1
                if w not in index:
                    work[-1] = (v, pi)
                    work.append((w, 0))
                    advanced = True
                    break
                if w in on_stack:
                    low[v] = min(low[v], index[w])
            if advanced:
                continue
            work.pop()
            if low[v] == index[v]:
                members = []
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    members.append(w)
                    if w == v:
                        break
                root = min(members)
                for w in members:
                    comp[w] = root
            if work:
                p, _ = work[-1]
                low[p] = min(low[p], low[v])
    rows = [(n, comp[n]) for n in sorted(nodes)]
    if not rows:
        return spark.createDataFrame([], "node string, component string")
    return spark.createDataFrame(rows, ["node", "component"])


def _min_reach_labels(nodes: DataFrame, e: DataFrame,
                      max_iterations: int) -> DataFrame:
    """(node, label): label = min node id that can REACH node along
    the directed edges (including node itself). Hash-min fixpoint,
    O(diameter) rounds, lineage truncated per round; edges partitioned
    on the loop key once so rounds never reshuffle them."""
    from mms_rdf_spark.operators.pagerank import (
        _loop_partitions,
        partitioned_checkpoint,
    )

    p = _loop_partitions(e, e.count())
    e = partitioned_checkpoint(e.repartition(p, "a"))
    # bare nodes checkpointed, label aliased lazily on top (see
    # connected_components: an in-plan alias collapses the partitioning
    # to a PartitioningCollection the checkpoint cannot capture)
    nodes0 = partitioned_checkpoint(nodes.repartition(p, "node"))
    labels = nodes0.withColumn("label", F.col("node"))
    for _ in range(max_iterations):
        nbr = (e.join(labels, e["a"] == labels["node"])
               .groupBy(F.col("b").alias("node"))
               .agg(F.min("label").alias("nbr")))
        new = partitioned_checkpoint(
            labels.join(nbr, on="node", how="left")
            .select("node",
                    F.least(F.col("label"),
                            F.coalesce(F.col("nbr"), F.col("label")))
                    .alias("label")))
        changed = (new.alias("n").join(labels.alias("o"), on="node")
                   .where(F.col("n.label") != F.col("o.label")).count())
        labels = new
        if changed == 0:
            break
    return labels


def strongly_connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 30,
    max_iterations: int = 50,
    driver_threshold: int = 200_000,
) -> DataFrame:
    """Directed (src, dst) edges -> (node, component) with component =
    min node id (string order) in the node's STRONGLY connected
    component — the directed sibling of `connected_components`
    (mutual reachability, not mere contact).

    Small-graph fast path: below `driver_threshold` distinct edges,
    iterative Tarjan on the driver (the union-find analog). Above it,
    FW-BW coloring: per round, (1) TRIM — nodes with no in- or no
    out-edge among the remaining graph are singleton SCCs; (2) color
    every remaining node with fwd = min id reaching it and bwd = min
    id it reaches (two hash-min fixpoints, O(diameter) rounds each,
    localCheckpoint lineage); a node with fwd == bwd == c is in
    SCC(c) (c reaches it and it reaches c), and the SCC of the
    globally minimal remaining id always finalizes, so every round
    retires >=1 SCC plus the trimmed fringe. Pathological chains of
    thousands of interleaved SCCs exhaust `max_rounds` and raise
    (loud, never mislabels); both paths are tested equivalent."""
    e0 = (edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
          .where(F.col("a").isNotNull() & F.col("b").isNotNull())
          .distinct().localCheckpoint())
    if e0.count() <= driver_threshold:
        return _tarjan_scc(edges.sparkSession, e0)

    remaining = (e0.select(F.col("a").alias("node"))
                 .union(e0.select(F.col("b").alias("node")))
                 .distinct().localCheckpoint())
    parts: list[DataFrame] = []
    for _ in range(max_rounds):
        if remaining.isEmpty():
            break
        e = (e0.join(remaining.withColumnRenamed("node", "a"), on="a",
                     how="left_semi")
             .join(remaining.withColumnRenamed("node", "b"), on="b",
                   how="left_semi").localCheckpoint())
        # trim: no in-edge or no out-edge => singleton SCC
        has_in = e.select(F.col("b").alias("node")).distinct()
        has_out = e.select(F.col("a").alias("node")).distinct()
        core = (remaining.join(has_in, on="node", how="left_semi")
                .join(has_out, on="node", how="left_semi")
                .localCheckpoint())
        trimmed = remaining.join(core, on="node", how="left_anti") \
            .select("node", F.col("node").alias("component"))
        parts.append(trimmed.localCheckpoint())
        if core.isEmpty():
            remaining = core
            break
        ec = (e.join(core.withColumnRenamed("node", "a"), on="a",
                     how="left_semi")
              .join(core.withColumnRenamed("node", "b"), on="b",
                    how="left_semi").localCheckpoint())
        fwd = _min_reach_labels(core, ec, max_iterations)
        bwd = _min_reach_labels(
            core, ec.select(F.col("b").alias("a"), F.col("a").alias("b")),
            max_iterations)
        comp = (fwd.withColumnRenamed("label", "f")
                .join(bwd.withColumnRenamed("label", "bl"), on="node")
                .where(F.col("f") == F.col("bl"))
                .select("node", F.col("f").alias("component"))
                .localCheckpoint())
        parts.append(comp)
        remaining = (core.join(comp, on="node", how="left_anti")
                     .localCheckpoint())
    if not remaining.isEmpty():
        raise RuntimeError(
            "strongly_connected_components: max_rounds exhausted with "
            "nodes unresolved — raise max_rounds (chain-of-SCCs "
            "topology) or driver_threshold")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def scc_condensation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    **scc_kwargs,
) -> DataFrame:
    """Condense a digraph by its SCCs: (src_component, dst_component)
    distinct edges between DIFFERENT components — by construction a
    DAG (any cycle among components would merge them). Two broadcast-
    friendly label joins over the edge list."""
    comp = strongly_connected_components(edges, src, dst, **scc_kwargs)
    return (edges
            .join(comp.select(F.col("node").alias(src),
                              F.col("component").alias("src_component")),
                  on=src)
            .join(comp.select(F.col("node").alias(dst),
                              F.col("component").alias("dst_component")),
                  on=dst)
            .where(F.col("src_component") != F.col("dst_component"))
            .select("src_component", "dst_component")
            .distinct())


def topological_layers(
    dag_edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 50,
    nodes: DataFrame | None = None,
) -> DataFrame:
    """(node, layer) over a DAG: layer = longest path length from any
    source (layer 0 = no in-edges) — the parallel-schedule depth.
    Bellman-Ford-style hash-MAX fixpoint, O(depth) rounds with
    localCheckpoint lineage; raises if the fixpoint does not settle
    within `max_iterations` (a cycle — condense SCCs first).
    `nodes` (single `node` column) adds isolated nodes at layer 0 —
    pass the component list when layering a condensation, else
    edge-free components vanish."""
    if nodes is None:
        nodes = (dag_edges.select(F.col(src).alias("node"))
                 .union(dag_edges.select(F.col(dst).alias("node")))
                 .distinct())
    else:
        nodes = (nodes.select("node")
                 .union(dag_edges.select(F.col(src).alias("node")))
                 .union(dag_edges.select(F.col(dst).alias("node")))
                 .distinct())
    from mms_rdf_spark.operators.pagerank import (
        _loop_partitions,
        partitioned_checkpoint,
    )

    p = _loop_partitions(dag_edges, dag_edges.count())
    e = partitioned_checkpoint(
        dag_edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .distinct().repartition(p, "a"))
    layers = partitioned_checkpoint(
        nodes.withColumn("layer", F.lit(0).cast("long"))
        .repartition(p, "node"))
    for _ in range(max_iterations):
        nbr = (e.join(layers, e["a"] == layers["node"])
               .groupBy(F.col("b").alias("node"))
               .agg((F.max("layer") + 1).alias("cand")))
        new = partitioned_checkpoint(
            layers.join(nbr, on="node", how="left")
            .select("node",
                    F.greatest(F.col("layer"),
                               F.coalesce(F.col("cand"),
                                          F.col("layer")))
                    .alias("layer")))
        changed = (new.alias("n").join(layers.alias("o"), on="node")
                   .where(F.col("n.layer") != F.col("o.layer")).count())
        layers = new
        if changed == 0:
            return layers
    raise RuntimeError(
        "topological_layers: no fixpoint within max_iterations — the "
        "input has a cycle (condense SCCs first) or exceeds the bound")
