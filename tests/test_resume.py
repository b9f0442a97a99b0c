"""Exact-resume semantics (north rule): a rerun resumes from the last
complete stage; outputs are identical; a clobbered stage re-executes."""

from __future__ import annotations

import json
import os
import shutil

import pandas as pd

from mms_rdf_spark.pipeline import run_pipeline
from mms_rdf_spark.runlog import read_manifest
from mms_rdf_spark.synth import write_transcripts_parquet


def _snapshot(dfs):
    out = {}
    for k, df in dfs.items():
        pdf = df.toPandas()
        out[k] = pdf.sort_values(list(pdf.columns), na_position="first") \
            .reset_index(drop=True)
    return out


def test_pipeline_resume_exact(spark, tmp_path):
    data = str(tmp_path / "transcripts")
    out = str(tmp_path / "run")
    write_transcripts_parquet(data, n_convs=20, hot_conv_turns=50, n_files=4)

    first = _snapshot(run_pipeline(spark, data, out))

    # full resume: all manifests present -> byte-identical outputs
    second = _snapshot(run_pipeline(spark, data, out))
    for k in first:
        pd.testing.assert_frame_equal(first[k], second[k])

    # simulate a mid-pipeline kill: wipe a late stage, keep early ones
    shutil.rmtree(os.path.join(out, "lpg_nodes"))
    extract_manifest_before = read_manifest(out, "extract")
    third = _snapshot(run_pipeline(spark, data, out))
    for k in first:
        pd.testing.assert_frame_equal(first[k], third[k])
    # extract stage was NOT re-run (manifest untouched)
    assert read_manifest(out, "extract") == extract_manifest_before


def test_manifest_records_lineage(spark, tmp_path):
    data = str(tmp_path / "t2")
    out = str(tmp_path / "run2")
    write_transcripts_parquet(data, n_convs=10, hot_conv_turns=20, n_files=2)
    run_pipeline(spark, data, out)
    m = read_manifest(out, "extract")
    assert m["rows"] == sum(p["rows"] for p in m["partitions"])
    assert m["rows"] > 0 and m["duration_sec"] > 0
    assert "subject" in m["schema"]


def test_param_change_invalidates_resume(spark, tmp_path):
    data = str(tmp_path / "t3")
    out = str(tmp_path / "run3")
    write_transcripts_parquet(data, n_convs=10, hot_conv_turns=20, n_files=2)
    run_pipeline(spark, data, out)
    fp1 = read_manifest(out, "link")["fingerprint"]
    run_pipeline(spark, data, out, jaccard_threshold=0.9)
    fp2 = read_manifest(out, "link")["fingerprint"]
    assert fp1 != fp2
