"""Table-format adapter seam: ONE module owns every table write.

SURVEY §1.3/§7 (and the north rule) promise Iceberg tables; this
sandbox has no Iceberg jars AND no network to fetch them (verified:
repo1.maven.org unreachable), so parquet directories / Spark bucketed
catalog tables stand in. Exact runtime coordinates for this
environment (Spark 4.1.x, Scala 2.13):

    org.apache.iceberg:iceberg-spark-runtime-4.1_2.13:<latest>
    (or iceberg-spark-runtime-4.0_2.13:1.10.0 until the 4.1 line
     ships for your Iceberg release)

`tools/run_iceberg_check.py` is the env-gated opt-in live check
(SPARK_GRAFT_ICEBERG_JAR=<jar>); the same variable un-skips
tests/test_tables.py::test_iceberg_bucket_transform_and_snapshot.
Isolating the format decision here makes the promise checkable
instead of aspirational:

  - `iceberg_available(spark)` — True iff the Iceberg Spark runtime is
    on the classpath AND an Iceberg catalog is configured. On a real
    deployment this flips every write below to Iceberg with NO caller
    changes.
  - `write_table(df, target, ...)` — the single write entry. With
    Iceberg: `df.writeTo(name).using("iceberg")` with a
    `bucket(N, key)` / identity partition transform, returning the
    committed snapshot id from the table's `.snapshots` metadata.
    Without: path targets become (optionally partitioned) parquet
    directories; name targets with a bucket key become Spark
    `bucketBy(...).sortBy(...)` catalog tables (the exchange-free
    self-join layout test_plans pins). The returned manifest dict
    records which format actually ran — runlog stages persist it, so
    every run manifest says what it committed to.
  - `read_table(spark, target)` — the matching read entry.

Behavioral parity note: a Spark `bucketBy(N, k)` table and an Iceberg
`bucket(N, k)` transform both hash-distribute on k at write time; the
difference (Iceberg buckets survive engine restarts and other engines'
readers, Spark buckets live in the session catalog) is deployment
plumbing, not plan shape — the same zero-exchange sort-merge join
falls out of both.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_ICEBERG_EXT = ("org.apache.iceberg.spark.extensions."
                "IcebergSparkSessionExtensions")


def iceberg_available(spark: SparkSession) -> bool:
    """Iceberg runtime on the classpath + an Iceberg catalog configured.
    Both are required: the jar alone cannot commit a snapshot."""
    try:
        spark._jvm.java.lang.Class.forName(_ICEBERG_EXT)  # noqa: SLF001
    except Exception:
        return False
    try:
        confs = dict(spark.sparkContext.getConf().getAll())
    except Exception:
        return False
    return any(k.startswith("spark.sql.catalog.")
               and "iceberg" in str(v).lower()
               for k, v in confs.items())


def _is_path(target: str) -> bool:
    return "/" in target or os.sep in target


def write_table(
    df: DataFrame, target: str, *, mode: str = "overwrite",
    bucket_by: str | None = None, buckets: int = 64,
    sort_by: list[str] | None = None, partition_by: str | None = None,
) -> dict:
    """Write `df` to `target` (catalog name or filesystem path) and
    return a manifest fragment: {"format", "target", "snapshot_id"?}.

    bucket_by -> hash-distribute on that key at write time (Iceberg
    bucket transform / Spark bucketBy); partition_by -> identity
    partition (directory pruning). The two are the SPO layout levers:
    partition_by="pred_part" prunes per-predicate scans, bucket_by=
    "subject" makes BGP subject self-joins exchange-free."""
    spark = df.sparkSession
    if iceberg_available(spark) and not _is_path(target):
        w = df.writeTo(target).using("iceberg")
        if bucket_by is not None:
            w = w.partitionedBy(F.bucket(buckets, F.col(bucket_by)))
        elif partition_by is not None:
            w = w.partitionedBy(F.col(partition_by))
        w.createOrReplace()
        snap = spark.sql(
            f"SELECT snapshot_id FROM {target}.snapshots "
            "ORDER BY committed_at DESC LIMIT 1").collect()
        return {"format": "iceberg", "target": target,
                "snapshot_id": str(snap[0][0]) if snap else None}
    if _is_path(target):
        writer = df.write.mode(mode)
        if partition_by is not None:
            writer = writer.partitionBy(partition_by)
        elif bucket_by is not None:
            # path parquet has no bucket metadata; approximate the
            # layout so downstream scans still see key-clustered files
            df = df.repartition(buckets, bucket_by)
            writer = df.write.mode(mode)
        writer.parquet(target)
        return {"format": "parquet", "target": target}
    # catalog-table parquet fallback (the bucketed layout)
    spark.sql(f"DROP TABLE IF EXISTS {target}")
    _clear_stale_managed_dir(spark, target)
    writer = df.write.mode(mode).format("parquet")
    if bucket_by is not None:
        writer = writer.bucketBy(buckets, bucket_by) \
            .sortBy(*(sort_by or [bucket_by]))
    if partition_by is not None:
        writer = writer.partitionBy(partition_by)
    writer.saveAsTable(target)
    return {"format": "parquet", "target": target}


def read_table(spark: SparkSession, target: str) -> DataFrame:
    """Read back a `write_table` target (path or catalog name)."""
    if _is_path(target):
        return spark.read.parquet(target)
    return spark.table(target)


def _clear_stale_managed_dir(spark: SparkSession, table: str) -> None:
    """The in-memory catalog can forget a managed table whose files
    survive (e.g. after a crashed writer); clear the stale location so
    overwrite semantics hold across sessions too. Managed layout:
    <warehouse>/<name> for the default database, <warehouse>/<db>.db/
    <name> otherwise; 3-part (catalog-qualified) names are left to the
    catalog (never guess a path to rm there)."""
    import shutil
    from urllib.parse import urlparse

    parts = table.split(".")
    if len(parts) <= 2:
        warehouse = spark.conf.get("spark.sql.warehouse.dir")
        rel = parts[-1] if len(parts) == 1 or parts[0] == "default" \
            else f"{parts[0]}.db/{parts[1]}"
        shutil.rmtree(urlparse(f"{warehouse}/{rel}").path,
                      ignore_errors=True)


def compact_table(spark: SparkSession, target: str,
                  target_bytes: int = 128 * 1024 * 1024) -> dict:
    """Small-file compaction — the maintenance pass every streaming /
    incremental writer needs at scale (micro-batch commits leave
    kilobyte part files; a 100 TB scan over millions of tiny files is
    metadata-bound long before it is IO-bound). Iceberg deployments
    run rewrite_data_files; this is the parquet-path twin through the
    same seam.

    Bin-packs `target` (a parquet directory) into
    ceil(total_bytes / target_bytes) files, preserving rows exactly
    (content equality is the contract; the file COUNT is the
    observable). Crash-safe: the compacted copy is written to a
    sibling temp dir first, the original moved aside, the new one
    renamed into place, and the old data removed last — a crash
    leaves either the old dir or the new dir complete, never a
    half-written target (same discipline as streaming/snapshot.py,
    minus the version history a one-shot maintenance op doesn't need).

    Returns {"files_before", "files_after", "bytes", "target"}.
    """
    import os
    import shutil
    import uuid

    if not _is_path(target) or not os.path.isdir(target):
        raise ValueError("compact_table: parquet directory targets "
                         "only (Iceberg tables: rewrite_data_files)")

    def _parts(d: str) -> list[str]:
        out = []
        for root, _, files in os.walk(d):
            out += [os.path.join(root, f) for f in files
                    if f.endswith(".parquet")]
        return out

    before = _parts(target)
    total = sum(os.path.getsize(f) for f in before)
    n_out = max(1, -(-total // target_bytes))
    df = spark.read.parquet(target)
    tmp = f"{target.rstrip('/')}__compact_{uuid.uuid4().hex[:8]}"
    # coalesce, not repartition: packing needs no shuffle, only fewer
    # output tasks (row order within files is not part of the contract)
    df.coalesce(int(n_out)).write.mode("overwrite").parquet(tmp)
    old = f"{target.rstrip('/')}__old_{uuid.uuid4().hex[:8]}"
    os.replace(target, old) if os.path.isfile(target) else \
        shutil.move(target, old)
    shutil.move(tmp, target)
    shutil.rmtree(old)
    return {"files_before": len(before),
            "files_after": len(_parts(target)),
            "bytes": int(total), "target": target}
