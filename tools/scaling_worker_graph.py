"""Subprocess worker for the graph-lane scaling pair: measures the
MARGINAL per-iteration PageRank cost at a fixed parallelism over a
synthetic power-law-ish entity graph and prints one JSON line.
Separate process per (mode, cores) because one JVM cannot switch
local[N] masters (same protocol as scaling_worker.py /
scaling_worker_asof.py; shuffle partitions pinned identical at both
levels so the comparison isolates executor-thread count). This lane
exercises the iterative join+aggregate shape the canonicalization/
salience stages live on — a different bottleneck mix (shuffle + hash
agg) than the codegen-bound extraction lane."""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def synth(spark, data_dir: str, n_edges: int = 4_000_000,
          n_nodes: int = 500_000) -> None:
    """Deterministic directed graph with a skewed in-degree tail:
    dst = (id * 7919) % n_nodes for the uniform mass plus every 16th
    edge pointing into a 256-node "celebrity" head — the hot-entity
    shape the KG link graph actually has. Node ids are IRI-WIDTH
    strings (the pipeline's canonical mms-element:Entity.* shape,
    ~34 bytes), not bare integers — key width drives the shuffle and
    hash cost the lane exists to measure."""
    from pyspark.sql import functions as F

    def iri(col):
        return F.concat(F.lit("mms-element:Entity.surface-"),
                        F.lpad(col.cast("string"), 7, "0"))

    base = spark.range(n_edges).select(
        iri(F.col("id") % n_nodes).alias("src"),
        F.when(F.col("id") % 16 == 0,
               iri((F.col("id") * 31) % 256))
        .otherwise(iri((F.col("id") * 7919) % n_nodes))
        .alias("dst"))
    base.where(F.col("src") != F.col("dst")) \
        .repartition(64).write.mode("overwrite").parquet(data_dir)


def main(cores: int, data_dir: str, reps: int,
         encode: bool = False) -> None:
    """Marginal-iteration protocol, all inside ONE JVM: warmup at the
    high iteration count (JIT/codegen/OS-cache warm for both levels),
    then INTERLEAVED timed runs at iters=1 and iters=5, medians, and
    the marginal per-iteration rate = edges*4/(med5 - med1). Cross-JVM
    differencing is invalid (a fresh JVM warmed on the 1-iter job runs
    the timed reps measurably slower than one warmed on 5-iter — the
    difference swamps the 4-iteration delta); interleaving inside one
    JVM cancels warm-state and memory-pressure drift instead."""
    import statistics

    from mms_rdf_spark.operators.pagerank import pagerank
    from mms_rdf_spark.session import get_spark

    # 16 shuffle partitions at BOTH levels (protocol: pinned identical
    # so the pair isolates thread count): 4M edges / 16 = ~250k-edge
    # tasks — meaty enough that task time dwarfs scheduling. 128 put
    # the lane in the tiny-task regime (~30k edges/task, milliseconds)
    # where per-task overhead dominates and does not parallelize.
    spark = get_spark(f"scaling-graph-{cores}", cores=cores,
                      shuffle_partitions=16)
    edges = spark.read.parquet(data_dir)
    n_edges = edges.count()

    LO, HI = 1, 5

    def job(iters: int) -> int:
        return pagerank(edges, iters=iters, encode=encode).count()

    nodes = job(HI)  # warmup (codegen compile, JIT, page cache)
    times = {LO: [], HI: []}
    for _ in range(reps):
        for iters in (LO, HI):
            t0 = time.time()
            job(iters)
            times[iters].append(time.time() - t0)
    med_lo = statistics.median(times[LO])
    med_hi = statistics.median(times[HI])
    marginal = n_edges * (HI - LO) / (med_hi - med_lo)
    print(json.dumps({
        "cores": cores, "reps": reps, "encode": encode,
        "edges": n_edges, "nodes": nodes,
        "sec_1iter": round(med_lo, 3), "sec_5iter": round(med_hi, 3),
        "times_1iter": [round(t, 3) for t in times[LO]],
        "times_5iter": [round(t, 3) for t in times[HI]],
        "marginal_edge_iters_per_sec": round(marginal, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    if sys.argv[1] == "synth":
        from mms_rdf_spark.session import get_spark

        s = get_spark("scaling-graph-synth", cores=8,
                      shuffle_partitions=64)
        synth(s, sys.argv[2])
        s.stop()
    else:
        main(int(sys.argv[1]), sys.argv[2], int(sys.argv[3]),
             encode=len(sys.argv) > 4 and sys.argv[4] == "encode")
