"""Subprocess worker for the multimodal-decode scaling pair: real PPM
decode + channel statistics (Arrow mapInPandas path) at a fixed
parallelism, one JSON line out. Separate process per level (one JVM
cannot switch local[N] masters); shuffle partitions pinned identical so
the comparison isolates executor-thread count — which for this
workload means the number of CONCURRENT PYTHON WORKERS, the lane the
other pairs (codegen/window/regex) don't cover."""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def synth(spark, data_dir: str, n_rows: int = 200_000,
          h: int = 32, w: int = 32) -> None:
    from pyspark.sql import functions as F

    from mms_rdf_spark.operators.multimodal import synth_ppm_media

    docs = spark.range(n_rows).select(F.col("id").alias("doc_id"))
    synth_ppm_media(docs, h=h, w=w).repartition(64) \
        .write.mode("overwrite").parquet(data_dir)


def main(cores: int, data_dir: str, reps: int) -> None:
    from pyspark.sql import functions as F

    from mms_rdf_spark.operators.multimodal import image_stats
    from mms_rdf_spark.session import get_spark

    spark = get_spark(f"scaling-decode-{cores}", cores=cores,
                      shuffle_partitions=128,
                      extra_conf={
                          # compressed gradient PPMs pack into ~4 scan
                          # splits under the default 128MB policy,
                          # capping parallelism below the core count
                          # (NOTES.md gotcha) — pin ~8MB splits so both
                          # levels see the same ≥48-task layout
                          "spark.sql.files.maxPartitionBytes":
                              str(8 * 1024 * 1024),
                          "spark.sql.files.openCostInBytes":
                              str(1024 * 1024),
                      })
    media = spark.read.parquet(data_dir)
    n_rows = media.count()

    def job() -> float:
        # sum of decoded channel means forces EVERY payload through
        # the decoder; one scalar leaves the scan stage
        return image_stats(media).agg(
            F.sum("mean_r") + F.sum("mean_g")).collect()[0][0]

    job()  # warmup: codegen + Python worker pool spin-up excluded
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        job()
        best = min(best, time.time() - t0)
    print(json.dumps({"cores": cores, "rows": n_rows,
                      "sec": round(best, 3),
                      "rows_per_sec": round(n_rows / best)}))
    spark.stop()


if __name__ == "__main__":
    if sys.argv[1] == "synth":
        from mms_rdf_spark.session import get_spark

        s = get_spark("scaling-decode-synth", cores=8)
        synth(s, sys.argv[2])
        s.stop()
        print("{}")
    else:
        main(int(sys.argv[1]), sys.argv[2], int(sys.argv[3]))
