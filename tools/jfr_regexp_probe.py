"""JFR probe for the regexp thread-scaling anomaly (NOTES #8).

Round 2 measured `regexp_count`-style expressions scaling at ~0.42
marginal thread efficiency on this JVM while translate/split/hash
codegen scales at ~0.9 — worked AROUND via the translate swap
(textstats char-class counters) but never root-caused. This probe runs
the same differential pair (regexp_count vs translate-based counting
over an identical synthetic text corpus) at a given local[N] with Java
Flight Recorder on, then the driver script (run twice: cores=1 and
cores=4) compares:

  - wall time per expression family at each parallelism,
  - allocation-by-class (jdk.ObjectAllocationSample): java.util.regex
    Matcher/int[] churn is the prime suspect,
  - GC pause totals (jdk.GCPhasePause),
  - monitor contention (jdk.JavaMonitorEnter).

Usage:  python tools/jfr_regexp_probe.py <cores> <out.jfr>
Then:   jfr summary <out.jfr>; jfr print --events \
        jdk.ObjectAllocationSample <out.jfr> | sort | uniq -c

Results recorded in BASELINE.md ("regexp scaling root cause").
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main(cores: int, jfr_path: str) -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (SparkSession.builder
             .master(f"local[{cores}]")
             .appName(f"jfr-regexp-{cores}")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.driver.extraJavaOptions",
                     f"-XX:StartFlightRecording=filename={jfr_path},"
                     "settings=profile")
             .config("spark.driver.memory", "8g")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    n = 3_000_000
    base = spark.range(n, numPartitions=max(cores * 4, 8)).select(
        F.concat(
            F.lit("hello @user"), (F.col("id") % 997).cast("string"),
            F.lit(" says see http://ex.com/"),
            (F.col("id") % 91).cast("string"),
            F.lit(" and CAPS!! text mail a"),
            (F.col("id") % 53).cast("string"), F.lit("@b.com end"),
        ).alias("text"))
    base = base.localCheckpoint()  # freeze: timings exclude generation

    def timed(label, col):
        # warmup (codegen compile) then 3 reps, min
        base.agg(F.sum(col)).collect()
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            base.agg(F.sum(col)).collect()
            best = min(best, time.time() - t0)
        return round(best, 3)

    out = {
        "cores": cores,
        "regexp_mentions": timed(
            "regexp", F.regexp_count("text", F.lit(r"@[a-z]+\d+"))),
        "regexp_upper": timed(
            "regexp_cls", F.regexp_count("text", F.lit(r"[A-Z]"))),
        "translate_upper": timed(
            "translate",
            F.length("text") - F.length(F.translate(
                "text", "ABCDEFGHIJKLMNOPQRSTUVWXYZ", ""))),
        "split_tokens": timed(
            "split", F.size(F.split("text", " "))),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]), sys.argv[2])
