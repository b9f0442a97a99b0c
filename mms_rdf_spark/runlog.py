"""Per-stage checkpoint manifests: exact resume + lineage + metrics.

North-rule requirement: "resumable from checkpoint with per-partition
lineage + metrics". Every pipeline stage materializes its output table
and a `_manifest.json` recording:

  - `fingerprint`: hash of (stage name, input paths, params) — the
    resume key. A rerun with identical inputs/params skips the stage
    and reads its committed output (the Spark analog of the
    reference's resumable edge-id seed + remainder repair,
    lpg/convert.js:73, multi/worker.js:120-151).
  - `partitions`: per-output-file row counts (lineage counters) read
    from the committed parquet FOOTERS — exact, zero extra scan (the
    Iceberg analog is the snapshot manifest's per-file record counts).
  - `rows`, `duration_sec`, `completed_at`, `schema`.

Stage writes are atomic-by-rename: data lands in `<stage>.tmp/` and is
renamed over `<stage>/` only after the footer audit succeeds, then the
manifest is written LAST — a killed run leaves either no manifest
(stage reruns) or a complete one (stage skips). Reruns therefore never
double-count (idempotent overwrite-by-stage, not append). On real
object storage the same protocol rides Iceberg snapshot commits; the
manifest would record the snapshot id.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


def _fingerprint(stage: str, inputs: list[str], params: dict) -> str:
    blob = json.dumps({"stage": stage, "inputs": sorted(inputs),
                       "params": params}, sort_keys=True, default=str)
    return hashlib.sha256(blob.encode()).hexdigest()[:24]


def stage_paths(out_dir: str, stage: str) -> tuple[str, str]:
    return os.path.join(out_dir, stage), os.path.join(out_dir, stage, "_manifest.json")


def read_manifest(out_dir: str, stage: str) -> dict | None:
    _, mpath = stage_paths(out_dir, stage)
    if not os.path.exists(mpath):
        return None
    with open(mpath) as fh:
        return json.load(fh)


def run_stage(
    spark: SparkSession,
    out_dir: str,
    stage: str,
    inputs: list[str],
    params: dict,
    build: Callable[[], DataFrame],
    resume: bool = True,
    partition_by: str | None = None,
) -> DataFrame:
    """Execute (or resume) one stage; returns the committed output DF.

    `build` produces the stage's output DataFrame lazily; it only runs
    when the stage cannot be resumed.
    """
    data_dir, mpath = stage_paths(out_dir, stage)
    fp = _fingerprint(stage, inputs, params)

    m = read_manifest(out_dir, stage)
    if resume and m is not None and m.get("fingerprint") == fp:
        return spark.read.parquet(os.path.join(data_dir, "data"))

    t0 = time.time()
    df = build()
    tmp = data_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    # the format seam: parquet here; Iceberg (with a real snapshot id
    # in `written`) when the runtime is present — see tables.py
    from mms_rdf_spark.tables import write_table

    written = write_table(df, os.path.join(tmp, "data"),
                          partition_by=partition_by)

    committed = spark.read.parquet(os.path.join(tmp, "data"))
    # Per-partition lineage counters from the parquet FOOTERS of the
    # files the write just committed — zero extra scan. The previous
    # protocol re-read the whole stage output through a
    # groupBy(spark_partition_id) job just to count rows per
    # partition; at 100 TB that is a second full pass over every
    # stage's data. Footer metadata is exact (parquet stores num_rows
    # per file) and O(files) driver-side reads; on Iceberg the same
    # counters come from the snapshot manifest for free.
    import pyarrow.parquet as pq

    data_dir_tmp = os.path.join(tmp, "data")
    part_files = sorted(
        os.path.join(root, f)
        for root, _dirs, fs in os.walk(data_dir_tmp)
        for f in fs
        if f.endswith(".parquet") and not f.startswith("_"))
    part_counts = [
        {"partition": i,
         "rows": pq.ParquetFile(f).metadata.num_rows}
        for i, f in enumerate(part_files)
    ]
    total = sum(p["rows"] for p in part_counts)

    shutil.rmtree(data_dir, ignore_errors=True)
    os.replace(tmp, data_dir)
    # content snapshot id: hash of the committed file listing (name,
    # size) — the parquet-dir analog of an Iceberg snapshot id; a
    # resumed read can verify it still reads the bytes the manifest
    # describes.
    files = sorted(
        (f, os.path.getsize(os.path.join(data_dir, "data", f)))
        for f in os.listdir(os.path.join(data_dir, "data"))
        if not f.startswith("_") and not f.startswith("."))
    snapshot_id = hashlib.sha256(json.dumps(files).encode()).hexdigest()[:16]
    out_bytes = sum(sz for _, sz in files)
    manifest = {
        "stage": stage,
        "fingerprint": fp,
        "table_format": written["format"],
        "snapshot_id": written.get("snapshot_id") or snapshot_id,
        "output_bytes": out_bytes,
        "inputs": inputs,
        "params": params,
        "rows": total,
        "partitions": sorted(part_counts, key=lambda p: p["partition"]),
        "duration_sec": round(time.time() - t0, 3),
        "completed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "schema": committed.schema.simpleString(),
    }
    with open(mpath, "w") as fh:
        json.dump(manifest, fh, indent=1)
    return spark.read.parquet(os.path.join(data_dir, "data"))
