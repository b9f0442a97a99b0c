"""Extra benchmarks (guide §1.4): per-query noop-sink isolation.

NOT the driver contract — bench.py stays frozen. This harness times
individual headliner queries with the noop sink (computes every column,
discards output) so optimization work measures the computation, not the
sink or .count() pruning.

Usage:
  python bench_extra.py <name> [name ...]        # defaults: all headliners
  SPARK_GRAFT_BENCH_RUNS=3 python bench_extra.py dedup_lsh_pairs

Prints one JSON line: {"queries": {name: min_sec}, "runs": [...]}.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_RUNS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2")))

HEADLINERS = [
    "tpch_q1", "tpch_q3", "events_window", "dedup_lsh_pairs",
    "sim_cosine_topk", "text_quality", "events_asof", "kg_pagerank",
    "text_bm25", "sketch_distinct", "text_curate_full", "kg_sft_windows",
    "text_chunks", "text_bt_scores", "mm_image_ahash", "kg_simrank",
    "events_hilbert", "dedup_dup_spans", "text_nb_lang",
]


def main() -> None:
    names = sys.argv[1:] or HEADLINERS

    import __spark_entry__ as E
    from mms_rdf_spark.session import get_spark

    spark = get_spark("mms-rdf-bench-extra", cores=CPUS)
    qs = E.queries()
    spark.read.parquet(f"{SF_DIR}/events.parquet").count()  # warm-up

    runs: list[dict] = []
    for _ in range(N_RUNS):
        timings: dict[str, float] = {}
        for name in names:
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            qs[name](spark, SF_DIR).write.format("noop") \
                .mode("overwrite").save()
            timings[name] = round(time.time() - t0, 3)
            spark.sparkContext.setJobDescription(None)
        runs.append(timings)
    q_min = {n: min(r[n] for r in runs) for n in names}
    print(json.dumps({"queries": q_min, "runs": runs, "sf_dir": SF_DIR}))
    spark.stop()


if __name__ == "__main__":
    main()
