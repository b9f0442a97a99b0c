"""Hard-kill resume: SIGKILL the pipeline process mid-run, rerun, and
require byte-identical results vs an uninterrupted run. Exercises the
write-to-tmp/rename/manifest-last commit protocol for real (the
in-process resume tests only simulate by deleting stage dirs)."""

from __future__ import annotations

import os
import signal
import subprocess
import sys
import time

import pandas as pd

RUNNER = r"""
import sys
sys.path.insert(0, "/root/repo")
from mms_rdf_spark.session import get_spark
from mms_rdf_spark.pipeline import run_pipeline
spark = get_spark("kill-test", cores=4, shuffle_partitions=8)
run_pipeline(spark, sys.argv[1], sys.argv[2])
print("PIPELINE_DONE", flush=True)
spark.stop()
"""


def _snapshot(spark, out):
    dfs = {}
    for stage in ("extract", "amend", "lpg_edges"):
        pdf = spark.read.parquet(os.path.join(out, stage, "data")).toPandas()
        dfs[stage] = pdf.sort_values(list(pdf.columns), na_position="first") \
            .reset_index(drop=True)
    return dfs


def test_sigkill_midrun_then_resume(spark, tmp_path):
    from mms_rdf_spark.synth import write_transcripts_parquet

    data = str(tmp_path / "t")
    out_ref = str(tmp_path / "ref")
    out_kill = str(tmp_path / "killed")
    write_transcripts_parquet(data, n_convs=40, hot_conv_turns=80, n_files=4)

    # uninterrupted reference run (subprocess, same code path)
    subprocess.run([sys.executable, "-c", RUNNER, data, out_ref],
                   check=True, capture_output=True, timeout=600)

    # killed run: SIGKILL a few seconds after the extract stage starts
    p = subprocess.Popen([sys.executable, "-c", RUNNER, data, out_kill],
                         stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    deadline = time.time() + 240
    killed = False
    while time.time() < deadline:
        if p.poll() is not None:
            break  # finished before we got to kill it — rerun still must work
        if os.path.isdir(os.path.join(out_kill, "extract")) or \
           os.path.isdir(os.path.join(out_kill, "extract.tmp")):
            time.sleep(1.0)
            if p.poll() is None:
                os.kill(p.pid, signal.SIGKILL)
                killed = True
            break
        time.sleep(0.25)
    p.wait(timeout=600)

    # resume (fresh process) must complete and match the reference
    subprocess.run([sys.executable, "-c", RUNNER, data, out_kill],
                   check=True, capture_output=True, timeout=600)

    ref = _snapshot(spark, out_ref)
    got = _snapshot(spark, out_kill)
    for stage in ref:
        pd.testing.assert_frame_equal(ref[stage], got[stage])
    assert killed or p.returncode == 0
