"""Live spark-submit --py-files deployment check (north-rule path).

Packages mms_rdf_spark as a zip, launches a REAL spark-submit process
from a neutral working directory (so the package can only come from the
--py-files zip, never from the repo checkout on sys.path), runs the full
pipeline, and compares stage counts + an order-insensitive content hash
of the amended graph against an in-process run on the same input. A
second spark-submit run then asserts exact resume: every stage manifest
is byte-identical (nothing recomputed) and the output hash unchanged.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit_bin() -> str | None:
    import pyspark

    cand = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    return cand if os.path.exists(cand) else shutil.which("spark-submit")


def _content_hash(df) -> str:
    # mirror of tools/submit_pipeline.content_hash
    pdf = df.toPandas()
    pdf = pdf[sorted(pdf.columns)].astype(str)
    rows = sorted(",".join(r) for r in pdf.itertuples(index=False, name=None))
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


def _build_zip(dst: str) -> None:
    pkg = os.path.join(REPO, "mms_rdf_spark")
    with zipfile.ZipFile(dst, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    p = os.path.join(root, f)
                    zf.write(p, os.path.relpath(p, REPO))


def _submit(submit, script, zip_path, inp, out, cwd, extra=()):
    env = dict(os.environ)
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    env.pop("PYTHONPATH", None)  # the zip must be the only package source
    proc = subprocess.run(
        [submit, "--master", "local[8]",
         "--conf", "spark.sql.shuffle.partitions=16",
         "--conf", "spark.ui.enabled=false",
         "--py-files", zip_path, script,
         "--input", inp, "--out", out, *extra],
        cwd=cwd, env=env, capture_output=True, text=True, timeout=420)
    assert proc.returncode == 0, proc.stderr[-4000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


@pytest.mark.skipif(_spark_submit_bin() is None, reason="no spark-submit")
def test_spark_submit_py_files_matches_in_process(spark, tmp_path):
    from mms_rdf_spark.pipeline import run_pipeline
    from mms_rdf_spark.synth import make_transcripts

    import pyarrow as pa
    import pyarrow.parquet as pq

    inp = str(tmp_path / "transcripts.parquet")
    pq.write_table(pa.Table.from_pandas(
        make_transcripts(n_convs=30, seed=7, hot_conv_turns=80)), inp)

    # package the library exactly as a cluster deploy would
    zip_path = str(tmp_path / "mms_rdf_spark.zip")
    _build_zip(zip_path)
    script = str(tmp_path / "submit_pipeline.py")
    shutil.copy(os.path.join(REPO, "tools", "submit_pipeline.py"), script)

    out_sub = str(tmp_path / "run_submit")
    got = _submit(_spark_submit_bin(), script, zip_path, inp, out_sub,
                  cwd=str(tmp_path))

    # in-process reference on the same input
    ref = run_pipeline(spark, inp, str(tmp_path / "run_ref"))
    ref_counts = {k: v.count() for k, v in ref.items()}
    assert got["stages"] == ref_counts
    assert got["amended_hash"] == _content_hash(ref["amended"])

    # second submit run = exact resume: same hash, no stage recomputed
    stage_dirs = ["vocab_triples", "extract", "link", "materialize",
                  "amend", "lpg_nodes", "lpg_edges", "shacl_violations"]
    manifests_before = {
        s: open(os.path.join(out_sub, s, "_manifest.json")).read()
        for s in stage_dirs}
    again = _submit(_spark_submit_bin(), script, zip_path, inp, out_sub,
                    cwd=str(tmp_path))
    assert again == got
    for s, blob in manifests_before.items():
        assert open(os.path.join(out_sub, s, "_manifest.json")).read() == blob
