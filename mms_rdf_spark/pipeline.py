"""End-to-end KG-construction pipeline driver (spark-submit entry).

    spark-submit --py-files mms_rdf_spark.zip -m  ... OR
    python -m mms_rdf_spark.pipeline --input <transcripts parquet/iceberg> \
        --out build/run1 [--cores 32] [--no-resume]

Stage graph (each checkpointed + resumable via runlog manifests):

    extract      transcripts -> triples            (extract.py)
    link         triples -> entity table           (link.py + cc.py)
    materialize  triples + entities -> final graph (materialize.py)
    amend        final graph -> gap-filled graph   (amend.py)
    lpg_nodes / lpg_edges                          (materialize.py)

Each stage reads ONLY committed outputs of prior stages from disk, so
a rerun after a mid-pipeline kill resumes from the last complete stage
with byte-identical results (tested in tests/test_resume.py).
"""

from __future__ import annotations

import argparse
import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mms_rdf_spark.operators import materialize as M
from mms_rdf_spark.operators.amend import amend
from mms_rdf_spark.operators.extract import extract_triples
from mms_rdf_spark.operators.link import link_mentions
from mms_rdf_spark.runlog import read_manifest, run_stage


def _vocab_triples_df(spark: SparkSession) -> DataFrame:
    """Vocabulary triples with an EXPLICIT schema: the all-null `lang`
    column makes plain type inference fail on sessions without the
    Arrow conf (e.g. a bare spark-submit session), so correctness must
    not depend on session configuration."""
    import pandas as pd

    from mms_rdf_spark.operators.extract import TRIPLE_SCHEMA
    from pyspark.sql.types import StructType

    from mms_rdf_spark.vocab import vocab_triples_pdf

    pdf = vocab_triples_pdf()
    schema = StructType(
        [f for f in TRIPLE_SCHEMA.fields if f.name in pdf.columns])
    names = [f.name for f in schema.fields]
    # pandas spells missing as float NaN (DataFrame.where(cond, None)
    # can't fix it — None IS pandas' missing sentinel); convert per cell
    rows = [
        tuple(None if pd.isna(v) else (int(v) if n == "idx" else v)
              for n, v in zip(names, r))
        for r in pdf[names].itertuples(index=False, name=None)]
    return spark.createDataFrame(rows, schema=schema)


def run_pipeline(
    spark: SparkSession,
    input_path: str,
    out_dir: str,
    resume: bool = True,
    jaccard_threshold: float = 0.55,
) -> dict[str, DataFrame]:
    os.makedirs(out_dir, exist_ok=True)
    params = {"jaccard": jaccard_threshold, "version": 1}

    # TBox named graph: the vocabulary as its own triples table
    # (mms-graph:vocabulary analog — kept separate from the data graph)
    vocab_triples = run_stage(
        spark, out_dir, "vocab_triples", [], params,
        lambda: _vocab_triples_df(spark),
        resume=resume,
    )

    triples = run_stage(
        spark, out_dir, "extract", [input_path], params,
        lambda: extract_triples(spark, spark.read.parquet(input_path)),
        resume=resume,
    )

    entities = run_stage(
        spark, out_dir, "link", [input_path], params,
        lambda: link_mentions(
            triples.where(F.col("predicate") == "mms-property:mentions"),
            jaccard_threshold),
        resume=resume,
    )

    graph = run_stage(
        spark, out_dir, "materialize", [input_path], params,
        lambda: M.rewrite_mentions_canonical(triples, entities)
        .unionByName(M.entity_triples(entities)),
        resume=resume,
    )

    amended = run_stage(
        spark, out_dir, "amend", [input_path], params,
        lambda: amend(graph), resume=resume,
    )

    nodes = run_stage(
        spark, out_dir, "lpg_nodes", [input_path], params,
        lambda: M.lpg_nodes(amended), resume=resume,
    )
    edges = run_stage(
        spark, out_dir, "lpg_edges", [input_path], params,
        lambda: M.lpg_edges(amended), resume=resume,
    )

    # canonical SPO layout: predicate-partitioned + subject-repartitioned
    # (partition pruning for per-predicate scans; asserted in test_plans)
    spo_dir = os.path.join(out_dir, "spo")
    if not resume or read_manifest(out_dir, "lpg_edges") is None \
            or not os.path.isdir(spo_dir):
        M.write_spo(amended, spo_dir)

    # shape validation report (SHACL-ish, derived from the vocabulary)
    from mms_rdf_spark.shapes import validate

    violations = run_stage(
        spark, out_dir, "shacl_violations", [input_path], params,
        lambda: validate(spark, amended), resume=resume,
    )

    return {"vocab_triples": vocab_triples, "triples": triples,
            "entities": entities, "graph": graph, "amended": amended,
            "lpg_nodes": nodes, "lpg_edges": edges,
            "shacl_violations": violations}


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--cores", type=int, default=None)
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--jaccard", type=float, default=0.55)
    args = ap.parse_args()

    from mms_rdf_spark.session import get_spark

    spark = get_spark("mms-rdf-pipeline", cores=args.cores)
    try:
        out = run_pipeline(spark, args.input, args.out,
                           resume=not args.no_resume,
                           jaccard_threshold=args.jaccard)
        summary = {k: v.count() for k, v in out.items()}
        print(json.dumps({"stages": summary}))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
