"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": ..., "value": <min-of-N total sec>, "unit": "sec",
   "queries": {name: min sec}, "runs": [per-run timings...],
   "n_runs": N, "value_median": ..., "sf": ..., "triples_per_sec": ...}

Headliners cover the engine's load-bearing paths: full KG triple
extraction (the north-star metric), linking+CC, LPG projection, the
relational suite, dedup/LSH, similarity top-k, and text curation.

Protocol (round-2 verdict #8): this host's wall-clock swings ±50%, so
a single-number artifact makes round-over-round comparisons
unexplainable. The suite runs N times (SPARK_GRAFT_BENCH_RUNS,
default 2) in one session after a shared warm-up; the headline
`value`/`queries` are per-query MINIMA (the least-noise estimator for
a quiet-box lower bound), and `runs` preserves the raw spread so any
regression claim can be checked against the noise floor.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_RUNS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2")))


def main() -> None:
    from pyspark.sql import functions as F

    import __spark_entry__ as E
    from mms_rdf_spark.kgdemo import transcripts_from_events, triples_from_events
    from mms_rdf_spark.operators.cc import connected_components
    from mms_rdf_spark.operators.link import (
        candidate_edges,
        entity_table,
        link_mentions,
    )
    from mms_rdf_spark.operators import materialize as M
    from mms_rdf_spark.session import get_spark

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("mms-rdf-bench", cores=CPUS)
    qs = E.queries()

    # warm the JVM/codegen once (excluded from timings)
    spark.read.parquet(f"{SF_DIR}/events.parquet").count()

    # one-time inputs shared by every run (data gen, not engine work)
    import tempfile
    stage_dir = tempfile.mkdtemp(prefix="bench_triples_")
    from mms_rdf_spark.operators.extract import extract_triples
    from mms_rdf_spark.synth import write_transcripts_parquet

    # mention-scale entity linking corpus: 2k-entity Zipf pool (hot
    # entities) — the real linking workload shape
    link_dir = write_transcripts_parquet(
        "build/transcripts_linkbench", n_convs=2000, hot_conv_turns=1000,
        n_files=32, n_entities=2000)
    link_turns = spark.read.parquet(link_dir)

    def run_once() -> tuple[dict[str, float], int, int]:
        timings: dict[str, float] = {}

        def timed(name, fn):
            t0 = time.time()
            out = fn()
            timings[name] = round(time.time() - t0, 3)
            return out

        # 1. KG extraction throughput (north-star metric): compute-only
        # first (the triples/sec figure), then the staged write the
        # pipeline performs (downstream stages read committed output).
        n_triples = timed(
            "kg_extract", lambda: triples_from_events(spark, SF_DIR).count())
        timed("kg_extract_stage",
              lambda: triples_from_events(spark, SF_DIR)
              .write.mode("overwrite").parquet(stage_dir))
        n_turns = transcripts_from_events(spark, SF_DIR).count()
        triples = spark.read.parquet(stage_dir)

        # 2. linking + connected components over extracted artifacts
        def link_cc():
            art = triples.where(
                F.col("object").startswith("mms-artifact:Tool.ID:")) \
                .select(F.regexp_extract("object", r"ID:(.*)$", 1)
                        .alias("surface")) \
                .groupBy("surface").count() \
                .withColumnRenamed("count", "freq") \
                .withColumn("norm", F.lower(F.col("surface")))
            comps = connected_components(candidate_edges(art), "src", "dst")
            return entity_table(art, comps).count()
        timed("kg_link_cc", link_cc)

        # 3. LPG projection
        timed("kg_lpg", lambda: M.lpg_edges(triples).count()
              + M.lpg_nodes(triples).count())

        # 3b. mention-scale entity linking (the library composition:
        # surfaces collapse + localCheckpoint happen INSIDE the timed
        # region — one extraction pass feeds all four consumers)
        link_triples = extract_triples(spark, link_turns,
                                       include_conversations=False)
        timed("kg_link_mentions", lambda: link_mentions(
            link_triples.where(F.col("predicate") == "mms-property:mentions")
        ).count())

        # 4-9. operator-suite headliners via the contract queries
        # (events_asof / kg_pagerank / text_bm25 / sketch_distinct are
        # late-round-3 additions: headline totals before/after are not
        # comparable, but per-query minima are — compare on `queries`)
        # (round-4 additions at the tail: trajectory SFT cutting, RAG
        # chunking, Bradley-Terry training loop, real-decode image hash
        # — new baselines, per-query minima stay name-comparable)
        # (round-5 additions: SimRank pair iteration, Hilbert layout
        # ladder, substring-span exact dedup, in-engine Naive Bayes —
        # same rule, compare per-query by name)
        for name in ["tpch_q1", "tpch_q3", "events_window",
                     "dedup_lsh_pairs", "sim_cosine_topk", "text_quality",
                     "events_asof", "kg_pagerank", "text_bm25",
                     "sketch_distinct", "text_curate_full",
                     "kg_sft_windows", "text_chunks", "text_bt_scores",
                     "mm_image_ahash", "kg_simrank", "events_hilbert",
                     "dedup_dup_spans", "text_nb_lang"]:
            timed(name, lambda n=name: qs[n](spark, SF_DIR).count())
        return timings, n_triples, n_turns

    runs: list[dict] = []
    n_triples = n_turns = 0
    for _ in range(N_RUNS):
        timings, n_triples, n_turns = run_once()
        runs.append({"value": round(sum(timings.values()), 3),
                     "queries": timings})

    # headline = per-query MIN across runs; medians preserved alongside
    q_min = {n: min(r["queries"][n] for r in runs)
             for n in runs[0]["queries"]}
    totals = [r["value"] for r in runs]
    total = round(sum(q_min.values()), 3)
    print(json.dumps({
        "metric": "headline_total_runtime",
        "value": total,
        "unit": "sec",
        "queries": q_min,
        "n_runs": N_RUNS,
        "runs": runs,
        "value_min_total": min(totals),
        "value_median": round(statistics.median(totals), 3),
        "sf": sf,
        "cpus": CPUS,
        "kg_triples": n_triples,
        "kg_turns": n_turns,
        "triples_per_sec": round(n_triples / q_min["kg_extract"], 1)
        if q_min.get("kg_extract") else None,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
