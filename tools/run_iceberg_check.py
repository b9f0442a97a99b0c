"""Opt-in Iceberg-live check (round-3 verdict #8 / NOTES #2: the seam
is real but the Iceberg branch had never executed in this sandbox).

Runs the SAME assertions as tests/test_tables.py::
test_iceberg_bucket_transform_and_snapshot against a real Iceberg
runtime: bucketed writeTo commit, snapshot id in the manifest, read
parity, and the bucket(N, key) partition transform in table metadata.

Usage (requires network or a pre-fetched jar — neither exists in this
sandbox, which is why the per-round artifacts gate on the env var):

    # exact coordinates for this environment (Spark 4.1.x / Scala 2.13):
    #   org.apache.iceberg:iceberg-spark-runtime-4.1_2.13:<latest>
    # (fall back to iceberg-spark-runtime-4.0_2.13:1.10.0 if the 4.1
    #  runtime line has not shipped for your Iceberg release yet)
    curl -fLo build/iceberg-spark-runtime.jar \
      https://repo1.maven.org/maven2/org/apache/iceberg/\
iceberg-spark-runtime-4.0_2.13/1.10.0/\
iceberg-spark-runtime-4.0_2.13-1.10.0.jar
    SPARK_GRAFT_ICEBERG_JAR=build/iceberg-spark-runtime.jar \
      python tools/run_iceberg_check.py

The pytest guard keys off the same env var, so one export flips both
this script and the skipped unit test on.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def build_iceberg_session(jar: str, warehouse: str):
    from pyspark.sql import SparkSession

    return (SparkSession.builder
            .master("local[4]")
            .appName("iceberg-live-check")
            .config("spark.jars", jar)
            .config("spark.sql.extensions",
                    "org.apache.iceberg.spark.extensions."
                    "IcebergSparkSessionExtensions")
            .config("spark.sql.catalog.iceberg_cat",
                    "org.apache.iceberg.spark.SparkCatalog")
            .config("spark.sql.catalog.iceberg_cat.type", "hadoop")
            .config("spark.sql.catalog.iceberg_cat.warehouse",
                    warehouse)
            .config("spark.sql.shuffle.partitions", "4")
            .getOrCreate())


def main() -> int:
    jar = os.environ.get("SPARK_GRAFT_ICEBERG_JAR")
    if not jar or not os.path.exists(jar):
        print("SKIP: set SPARK_GRAFT_ICEBERG_JAR to the "
              "iceberg-spark-runtime jar (see module docstring for "
              "the exact maven coordinates)")
        return 0
    from pyspark.sql import functions as F

    from mms_rdf_spark.tables import (iceberg_available, read_table,
                                      write_table)

    with tempfile.TemporaryDirectory() as wh:
        spark = build_iceberg_session(jar, wh)
        try:
            assert iceberg_available(spark), \
                "runtime on classpath but iceberg_available() is False"
            df = spark.range(50).select(
                F.col("id").cast("string").alias("subject"),
                F.col("id").alias("v"))
            m = write_table(df, "iceberg_cat.db.t",
                            bucket_by="subject", buckets=4)
            assert m["format"] == "iceberg", m
            assert m["snapshot_id"], m
            assert read_table(spark, "iceberg_cat.db.t").count() == 50
            spec = spark.sql(
                "SELECT partition FROM iceberg_cat.db.t.files"
            ).columns
            assert spec, "no partition metadata — bucket transform lost"
            print("ICEBERG LIVE CHECK: ALL PASS "
                  f"(snapshot {m['snapshot_id']})")
            return 0
        finally:
            spark.stop()


if __name__ == "__main__":
    sys.exit(main())
