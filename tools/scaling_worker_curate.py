"""Subprocess worker for the curation-pipeline scaling pair: runs the
fused one-exchange `curate` recipe (quality + stop-ratio + lang-ID
signals in one projection, exact-dedup window) at a fixed parallelism
over a synthetic English-ish corpus and prints one JSON line. Separate
process because one JVM cannot switch local[N] masters (same protocol
as scaling_worker.py / scaling_worker_asof.py; shuffle partitions
pinned identical at both levels)."""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

WORDS = ("the data pipeline shuffles rows and it aggregates the keys "
         "while the optimizer prunes a scan of the table or index")


def synth(spark, data_dir: str, n_docs: int = 1_000_000) -> None:
    """Deterministic corpus: ~20-token docs built from a rotating
    window over a stopword-bearing vocabulary, with every 97th doc an
    exact duplicate of its predecessor (dedup work is real)."""
    from pyspark.sql import functions as F

    vocab = WORDS.split(" ")
    arr = F.array(*[F.lit(w) for w in vocab])
    base_id = F.when(F.col("id") % 97 == 0,
                     F.col("id") - 1).otherwise(F.col("id"))
    # word index mixes the doc id multiplicatively so texts are
    # genuinely distinct across docs (a purely additive formula makes
    # every text id-mod-|vocab| periodic: ~21 distinct strings and a
    # degenerate dedup hash space)
    text = F.concat_ws(" ", F.transform(
        F.sequence(F.lit(0), F.lit(19)),
        lambda i: F.element_at(
            arr,
            (F.pmod(base_id * 7919 + (i + 1) * (base_id % 101 + 3),
                    F.lit(len(vocab))) + 1).cast("int"))))
    (spark.range(n_docs)
     .select(F.col("id").alias("doc_id"), text.alias("text"))
     .repartition(64).write.mode("overwrite").parquet(data_dir))


def main(cores: int, data_dir: str, reps: int) -> None:
    from mms_rdf_spark.operators.curate import curate
    from mms_rdf_spark.session import get_spark

    spark = get_spark(f"scaling-curate-{cores}", cores=cores,
                      shuffle_partitions=128)
    # the corpus parquet dictionary-compresses hard, so default
    # 128MB/4MB split packing collapses 64 files into ~2 scan splits —
    # capping parallelism at 2 TASKS no matter the core count (measured:
    # 1->4 cores gave 1.26x on the signal stage). Size splits to the
    # workload: this is the spark.sql.files.maxPartitionBytes lever,
    # and it is the experiment's independent variable done right.
    spark.conf.set("spark.sql.files.maxPartitionBytes", 2 * 1024 * 1024)
    spark.conf.set("spark.sql.files.openCostInBytes", 64 * 1024)
    docs = spark.read.parquet(data_dir)
    n_docs = docs.count()

    def job() -> int:
        return curate(docs, min_score=-10.0).count()

    job()  # warmup (codegen compile excluded)
    best = float("inf")
    kept = 0
    for _ in range(reps):
        t0 = time.time()
        kept = job()
        best = min(best, time.time() - t0)
    print(json.dumps({
        "cores": cores, "sec": round(best, 3), "reps": reps,
        "docs": n_docs, "kept": kept,
        "rows_per_sec": round(n_docs / best, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    if sys.argv[1] == "synth":
        from mms_rdf_spark.session import get_spark

        s = get_spark("scaling-curate-synth", cores=8,
                      shuffle_partitions=64)
        synth(s, sys.argv[2])
        s.stop()
    else:
        main(int(sys.argv[1]), sys.argv[2], int(sys.argv[3]))
