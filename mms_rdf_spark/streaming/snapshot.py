"""Versioned snapshot store: the commit primitive shared by the
incremental linker (streaming/link.py) and the incremental node
materializer (streaming/materialize.py).

A poor man's Iceberg snapshot on plain parquet (same seam as
tables.py — swap in real Iceberg commits when the runtime has the
jars):

    root/
      CURRENT                 <- text file naming the live version;
                                 os.replace() of this file is the ONE
                                 atomic commit operation
      v_0000000003_b7/
        _manifest.json        <- {"applied": [batch ids],
                                  "n_buckets": N, "tables": [...]}
                                 INSIDE the version dir, so replay
                                 idempotence is transactional with the
                                 data it describes
        <table>/bucket=K/...  <- one or more named tables, rows
                                 hash-partitioned by a bucket column

Commit protocol (crash-safe at every point):
  - build the new version dir: for each table write ONLY its touched
    buckets, hardlink every untouched bucket's files from the current
    version (parquet files are immutable — a later rewrite lands in a
    newer version, never mutates), write the manifest, then atomically
    repoint CURRENT.
  - crash BEFORE the pointer swap: CURRENT still names the old,
    complete version whose manifest lacks this batch id -> the replay
    re-derives against the OLD state, so nothing is lost and nothing
    double-applies. The half-built version dir is removed and rebuilt.
  - crash AFTER the pointer swap: the manifest inside the new CURRENT
    records the batch id -> the replay is a no-op.

Multiple tables committed together are transactional as a unit — one
pointer swap covers all of them (the node materializer needs this: the
accumulated-triples slice and the derived node rows must move in
lockstep or a crash between them would desynchronize state).

Scale: per-batch write cost is O(touched buckets) per table; untouched
buckets cost one hardlink per file. Old versions are left for
time-travel/debugging; `prune_versions` drops all but the newest K.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_BUCKETS = 16


def bucket_col(col: str, n_buckets: int) -> F.Column:
    """Deterministic bucket id: crc32 is stable across Spark versions
    and engines (unlike hash(), an implementation detail)."""
    return F.pmod(F.crc32(F.col(col)), F.lit(n_buckets)).cast("int")


def _pointer(root: str) -> str:
    return os.path.join(root, "CURRENT")


def current_version(root: str) -> str | None:
    try:
        with open(_pointer(root)) as fh:
            return fh.read().strip() or None
    except FileNotFoundError:
        return None


def manifest(root: str, version: str | None) -> dict:
    if version is None:
        return {"applied": [], "n_buckets": N_BUCKETS, "tables": []}
    with open(os.path.join(root, version, "_manifest.json")) as fh:
        return json.load(fh)


def applied_batches(root: str) -> list[int]:
    """Batch ids recorded in the CURRENT version's manifest."""
    return manifest(root, current_version(root))["applied"]


def read_table(spark: SparkSession, root: str,
               name: str = "data") -> DataFrame | None:
    """The named table of the CURRENT version, or None before the
    first commit (or if this version lacks the table). mergeSchema
    reconciles buckets written at different times with different
    column sets (pivot tables grow columns as predicates appear)."""
    version = current_version(root)
    if version is None:
        return None
    path = os.path.join(root, version, name)
    if not os.path.isdir(path):
        return None
    return spark.read.option("mergeSchema", "true").parquet(path)


def _link_tree(src: str, dst: str) -> None:
    os.makedirs(dst, exist_ok=True)
    for f in os.listdir(src):
        try:
            os.link(os.path.join(src, f), os.path.join(dst, f))
        except OSError:  # cross-device: fall back to copy
            shutil.copy2(os.path.join(src, f), os.path.join(dst, f))


def commit(
    spark: SparkSession,
    root: str,
    batch_id: int,
    tables: dict[str, tuple[DataFrame, set[int] | None]],
    n_buckets: int = N_BUCKETS,
) -> None:
    """Commit one or more tables as a new version (see module
    docstring). Each table maps to (full DataFrame, touched buckets);
    with touched=None the table is written in full (still crash-safe,
    just not incremental). Every DataFrame must carry an int `bucket`
    column. A replay of an applied batch id is a no-op."""
    os.makedirs(root, exist_ok=True)
    cur = current_version(root)
    man = manifest(root, cur)
    if batch_id in man["applied"]:
        return  # crash replay of a committed batch
    new_version = f"v_{len(man['applied']):010d}_b{batch_id}"
    new_dir = os.path.join(root, new_version)
    shutil.rmtree(new_dir, ignore_errors=True)  # crashed half-build
    for name, (df, touched) in tables.items():
        out = os.path.join(new_dir, name)
        cur_tab = None if cur is None \
            else os.path.join(root, cur, name)
        if cur_tab is not None and not os.path.isdir(cur_tab):
            cur_tab = None
        if cur_tab is None or touched is None:
            df.write.partitionBy("bucket").parquet(out)
        else:
            (df.where(F.col("bucket").isin(sorted(touched)))
             .write.partitionBy("bucket").parquet(out))
            old_buckets = {d for d in os.listdir(cur_tab)
                           if d.startswith("bucket=")}
            for b in old_buckets - {f"bucket={t}" for t in touched}:
                _link_tree(os.path.join(cur_tab, b),
                           os.path.join(out, b))
    with open(os.path.join(new_dir, "_manifest.json"), "w") as fh:
        json.dump({"applied": man["applied"] + [batch_id],
                   "n_buckets": n_buckets,
                   "tables": sorted(tables)}, fh)
    tmp_ptr = _pointer(root) + ".tmp"
    with open(tmp_ptr, "w") as fh:
        fh.write(new_version)
    os.replace(tmp_ptr, _pointer(root))  # THE commit


def prune_versions(root: str, keep: int = 2) -> None:
    """Drop all but the newest `keep` version dirs (the CURRENT one is
    always kept). Hardlinked files survive in the versions that still
    reference them — parquet files are immutable, deletion only drops
    link counts."""
    cur = current_version(root)
    versions = sorted(d for d in os.listdir(root)
                      if d.startswith("v_") and d != cur)
    for d in versions[:-max(keep - 1, 0)] if keep > 0 else versions:
        shutil.rmtree(os.path.join(root, d), ignore_errors=True)
