"""Iterative DataFrame fixpoint algorithms (SURVEY.md §4 "needs custom").

Two bounded-iteration driver loops the reference expresses as SPARQL
property paths, re-expressed as DataFrame self-joins:

  - transitive_closure: `rdfs:subClassOf*` reachability
    (reference triplifier.js:453-455, 470-472) — used by the
    vocabulary resolver and by the SPARQL-equivalent query checks.
  - unroll_lists: `rdf:rest*/rdf:first` ordered-list walk
    (reference src/lpg/convert.js:28-46) — in our encoding lists keep
    an explicit idx column, so the walk is a sort, not a join chain;
    provided for graphs that arrive in collection form.

Scale notes: each iteration is one shuffle on the join key; lineage is
truncated per iteration with localCheckpoint so plans stay O(1) deep
regardless of graph diameter (doubling keeps iterations logarithmic in
the longest path). Convergence is detected by a count() of new edges —
an action per iteration, which is the standard price of a fixpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def transitive_closure(
    edges: DataFrame,
    src: str = "sub",
    dst: str = "sup",
    max_iterations: int = 20,
    reflexive: bool = True,
) -> DataFrame:
    """All-pairs reachability over (src, dst) edges via path doubling.

    Returns a DataFrame (src, dst) of distinct reachable pairs.
    Iterations needed = ceil(log2(diameter)); max_iterations=20 covers
    paths of length 2^20.
    """
    closure = edges.select(F.col(src).alias("s"), F.col(dst).alias("d")).distinct()
    if reflexive:
        nodes = (closure.select(F.col("s").alias("n"))
                 .union(closure.select(F.col("d").alias("n"))).distinct())
        closure = closure.union(nodes.select(F.col("n").alias("s"),
                                             F.col("n").alias("d"))).distinct()
    closure = closure.localCheckpoint()
    for _ in range(max_iterations):
        grown = (
            closure.alias("a")
            .join(closure.alias("b"), F.col("a.d") == F.col("b.s"))
            .select(F.col("a.s").alias("s"), F.col("b.d").alias("d"))
            .union(closure)
            .distinct()
            .localCheckpoint()
        )
        new_edges = grown.count() - closure.count()
        closure = grown
        if new_edges == 0:
            break
    return closure.select(F.col("s").alias(src), F.col("d").alias(dst))


def unroll_lists(
    list_triples: DataFrame,
    subject: str = "subject",
    idx: str = "idx",
    obj: str = "object",
) -> DataFrame:
    """Ordered-list read-back: (subject, idx, object) -> per-subject
    arrays in idx order. The W2 inverse of posexplode-based list
    emission; sort_array(collect_list(struct(idx, obj))) keeps ordering
    stable under any partitioning (order is data, not iteration)."""
    return (
        list_triples
        .groupBy(subject)
        .agg(F.sort_array(F.collect_list(F.struct(F.col(idx).alias("i"),
                                                  F.col(obj).alias("o"))))
             .alias("_pairs"))
        .select(subject, F.col("_pairs.o").alias("items"))
    )
