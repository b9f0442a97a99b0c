"""Capture .explain("formatted") for the bench headliners (guide §1).

Usage: python tools/capture_plans.py <outdir> [name ...]
Writes <outdir>/<name>.txt for each headliner (default: all).

The four composite bench entries (kg_extract, kg_link_cc, kg_lpg,
kg_link_mentions) are reassembled exactly as bench.py builds them so the
captured plan is the one the driver times.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADLINERS = [
    "tpch_q1", "tpch_q3", "events_window", "dedup_lsh_pairs",
    "sim_cosine_topk", "text_quality", "events_asof", "kg_pagerank",
    "text_bm25", "sketch_distinct", "text_curate_full", "kg_sft_windows",
    "text_chunks", "text_bt_scores", "mm_image_ahash", "kg_simrank",
    "events_hilbert", "dedup_dup_spans", "text_nb_lang",
]


def main() -> None:
    outdir = sys.argv[1]
    only = set(sys.argv[2:])
    os.makedirs(outdir, exist_ok=True)

    from pyspark.sql import functions as F

    import __spark_entry__ as E
    from mms_rdf_spark.kgdemo import triples_from_events
    from mms_rdf_spark.operators.cc import connected_components
    from mms_rdf_spark.operators.link import (
        candidate_edges,
        entity_table,
        link_mentions,
    )
    from mms_rdf_spark.operators import materialize as M
    from mms_rdf_spark.operators.extract import extract_triples
    from mms_rdf_spark.session import get_spark

    spark = get_spark("mms-rdf-plans", cores=CPUS)
    qs = E.queries()

    def cap(name, df):
        if only and name not in only:
            return
        txt = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted"))
        with open(os.path.join(outdir, f"{name}.txt"), "w") as f:
            f.write(txt)
        print(f"wrote {name} ({txt.count('Exchange')} Exchange mentions)")

    # composites, assembled as in bench.py
    triples = triples_from_events(spark, SF_DIR)
    cap("kg_extract", triples)

    art = triples.where(
        F.col("object").startswith("mms-artifact:Tool.ID:")) \
        .select(F.regexp_extract("object", r"ID:(.*)$", 1).alias("surface")) \
        .groupBy("surface").count() \
        .withColumnRenamed("count", "freq") \
        .withColumn("norm", F.lower(F.col("surface")))
    comps = connected_components(candidate_edges(art), "src", "dst")
    cap("kg_link_cc", entity_table(art, comps))

    cap("kg_lpg_edges", M.lpg_edges(triples))
    cap("kg_lpg_nodes", M.lpg_nodes(triples))

    link_dir = "build/transcripts_linkbench"
    if os.path.exists(link_dir):
        link_turns = spark.read.parquet(link_dir)
        link_triples = extract_triples(spark, link_turns,
                                       include_conversations=False)
        cap("kg_link_mentions", link_mentions(
            link_triples.where(
                F.col("predicate") == "mms-property:mentions")))

    for name in HEADLINERS:
        cap(name, qs[name](spark, SF_DIR))
    spark.stop()


if __name__ == "__main__":
    main()
