"""Connected-components canonicalization (north-rule stage 3).

Iterative hash-min label propagation over an edge DataFrame: every
node's label converges to the minimum node id in its component. This
replaces the reference's implicit "same id => same IRI" identity plus
the ammend.js gap-fill with real entity resolution (SURVEY.md §4).

Scale design:
  - labels and edges are keyed DataFrames; each iteration is two
    shuffle joins (edge + label) + one min-aggregate, all equi-joins
    AQE can skew-split (hot entities = high-degree nodes).
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
) -> DataFrame:
    """(src, dst) undirected edges -> (node, component) with component =
    min node id (string order) in the node's component.

    Small-graph fast path: below `driver_threshold` distinct edges the
    graph is collected and solved with union-find on the driver — the
    iterative Spark fixpoint costs several jobs per round, which at
    vocab/entity-table sizes is pure overhead. Above the threshold the
    distributed hash-min + pointer-jumping loop runs. Both paths are
    tested equivalent; the threshold is a conf knob, not a semantic."""
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .where(F.col("a").isNotNull() & F.col("b").isNotNull())
        .distinct()
        .localCheckpoint()
    )
    n_edges = sym.count()
    if n_edges <= driver_threshold:
        return _driver_union_find(edges.sparkSession, sym)
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iterations):
        # hash-min: candidate label = min over neighbors' labels + own
        neighbor_min = (
            sym.join(labels.withColumnRenamed("node", "b"), on="b")
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
        jumped = jumped.localCheckpoint()
        changed = (
            jumped.alias("n").join(labels.alias("o"), on="node")
            .where(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = jumped
        if changed == 0:
            break
    return labels
