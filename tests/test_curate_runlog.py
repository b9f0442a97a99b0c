"""Curation composite + manifest snapshot fields."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_curate_filters_compose(spark):
    from mms_rdf_spark.operators.curate import curate
    from mms_rdf_spark.operators.textstats import detect_language, quality_score

    docs = spark.createDataFrame(
        [(0, "the of and to in a good clean sentence"),   # keeps
         (1, "the of and to in a good clean sentence"),   # exact dupe -> drop
         (2, "!!! ??? ###"),                              # low quality -> drop
         (3, "xyzzy plugh qwop zrtp flib"),               # non-en -> drop
         (4, "it is a fine day in the park and all of it")],  # keeps
        ["doc_id", "text"])
    kept = {r["doc_id"] for r in curate(docs).collect()}
    assert kept == {0, 4}
    # components agree with the standalone operators
    q = {r["doc_id"]: r["score"] for r in quality_score(docs).collect()}
    lid = {r["doc_id"]: r["lang_pred"]
           for r in detect_language(docs).collect()}
    assert q[2] <= 0.0 and lid[3] == "other"


def test_manifest_snapshot_fields(spark, tmp_path):
    from mms_rdf_spark.pipeline import run_pipeline
    from mms_rdf_spark.runlog import read_manifest
    from mms_rdf_spark.synth import write_transcripts_parquet

    data = str(tmp_path / "t")
    out = str(tmp_path / "run")
    write_transcripts_parquet(data, n_convs=8, hot_conv_turns=12, n_files=2)
    run_pipeline(spark, data, out)
    m = read_manifest(out, "extract")
    assert len(m["snapshot_id"]) == 16 and m["output_bytes"] > 0
    # resume leaves the snapshot untouched
    run_pipeline(spark, data, out)
    assert read_manifest(out, "extract")["snapshot_id"] == m["snapshot_id"]


def test_relative_quality_filter_cuts_bottom_decile(spark):
    from mms_rdf_spark.operators.curate import relative_quality_filter

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    n = docs.count()
    out = relative_quality_filter(docs, pctl=0.1)
    kept = out.count()
    # the p10 cut keeps ~90% (ties at the cutoff may keep a few more)
    assert 0.88 * n <= kept <= 0.95 * n, (kept, n)
    rows = out.collect()
    cut = rows[0]["cutoff"]
    assert all(r["score"] >= cut and r["cutoff"] == cut for r in rows)
