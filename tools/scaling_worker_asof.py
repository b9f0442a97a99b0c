"""Subprocess worker for the as-of-join scaling pair: runs the
union+window asof_join at a fixed parallelism over a synthetic
point-in-time workload and prints one JSON line. Separate process
because one JVM cannot switch local[N] masters (same protocol as
scaling_worker.py; shuffle partitions pinned identical at both levels
so the comparison isolates executor-thread count)."""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def synth(spark, data_dir: str, n_rows: int = 4_000_000,
          n_users: int = 100_000) -> None:
    """Deterministic event stream: n_rows left events + n_rows/5 right
    state changes over n_users keys, ts scattered over 30 days."""
    from pyspark.sql import functions as F

    base = spark.range(n_rows).select(
        F.col("id").alias("event_id"),
        (F.col("id") % n_users).alias("user_id"),
        F.timestamp_seconds(
            F.lit(1704067200) + (F.col("id") * 7919) % 2592000)
        .alias("ts"),
        ((F.col("id") * 31) % 1000 / 10.0).alias("value"),
        # 7 is coprime with n_users, so every user gets BOTH left
        # events and right state rows (id%5 would partition users:
        # 5 | 100000 -> zero matches, a broken workload)
        (F.col("id") % 7 == 0).alias("is_right"),
    )
    base.repartition(64).write.mode("overwrite").parquet(data_dir)


def main(cores: int, data_dir: str, reps: int) -> None:
    from pyspark.sql import functions as F

    from mms_rdf_spark.operators.temporal import asof_join
    from mms_rdf_spark.session import get_spark

    spark = get_spark(f"scaling-asof-{cores}", cores=cores,
                      shuffle_partitions=128)
    ev = spark.read.parquet(data_dir)
    left = ev.where(~F.col("is_right")) \
        .select("event_id", "user_id", "ts")
    right = (ev.where(F.col("is_right"))
             .groupBy("user_id", "ts").agg(F.max("value").alias("value")))
    n_left = left.count()

    def job() -> int:
        return asof_join(left, right, on="user_id") \
            .where(F.col("asof_value").isNotNull()).count()

    job()  # warmup (codegen compile excluded)
    best = float("inf")
    matched = 0
    for _ in range(reps):
        t0 = time.time()
        matched = job()
        best = min(best, time.time() - t0)
    print(json.dumps({
        "cores": cores, "sec": round(best, 3), "reps": reps,
        "left_rows": n_left, "matched": matched,
        "rows_per_sec": round(n_left / best, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    if sys.argv[1] == "synth":
        from mms_rdf_spark.session import get_spark

        s = get_spark("scaling-asof-synth", cores=8)
        synth(s, sys.argv[2])
        s.stop()
    else:
        main(int(sys.argv[1]), sys.argv[2], int(sys.argv[3]))
