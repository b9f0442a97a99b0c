"""Regenerate PLANS.md from live `explain` output.

Run on a quiet box: `python tools/dump_plans.py` rewrites PLANS.md so
the captured plans can never drift from the committed code (the
round-1 file went stale on the ts cast). Sections mirror the
assertions in tests/test_plans.py and tests/test_scale_caps.py.
"""

from __future__ import annotations

import io
import re
import sys
from contextlib import redirect_stdout
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import pyspark.sql.functions as F  # noqa: E402

from mms_rdf_spark.session import get_spark  # noqa: E402
from mms_rdf_spark.synth import write_transcripts_parquet  # noqa: E402


def formatted(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue().rstrip()


def skeleton(df) -> str:
    """Tree + one line per numbered node (the compact form for big
    union plans)."""
    text = formatted(df)
    tree, _, details = text.partition("\n\n\n")
    names = []
    for line in details.splitlines():
        m = re.match(r"^\((\d+)\) (.+)$", line)
        if m:
            names.append(f"({m.group(1)}) {m.group(2)}")
    keep = [ln for ln in tree.splitlines()
            if re.search(r"(Scan parquet|Exchange|Window|HashAggregate|"
                         r"Union|Generate|Join|Physical Plan|Filter)", ln)]
    return "\n".join(keep) + "\n" + "\n".join(
        n for n in names
        if re.search(r"Scan parquet|Exchange|Window|HashAggregate|Union|"
                     r"Generate|Join|Filter", n))


def main() -> None:
    spark = get_spark("dump-plans", cores=4, shuffle_partitions=8)
    data = str(REPO / "build" / "transcripts_plans")
    write_transcripts_parquet(data, n_convs=5, hot_conv_turns=10, n_files=2)
    turns = spark.read.parquet(data)

    from mms_rdf_spark.operators.dedup import lsh_candidate_pairs
    from mms_rdf_spark.operators.extract import extract_triples
    from mms_rdf_spark.operators.link import (
        candidate_edges,
        distinct_surfaces,
        entity_table,
    )
    from mms_rdf_spark.operators.cc import connected_components
    from mms_rdf_spark.operators.materialize import (
        rewrite_mentions_canonical,
    )
    from mms_rdf_spark.operators.similarity import embedding_near_duplicates

    sections: list[tuple[str, str, str]] = []

    sections.append((
        "Fused turn-level extraction (zero exchanges)",
        "One scan, one generate, all projections in whole-stage codegen "
        "— asserted shuffle-free in tests/test_plans.py.",
        formatted(extract_triples(spark, turns,
                                  include_conversations=False)),
    ))

    sections.append((
        "Full extraction (the only exchanges: conversation window + "
        "distinct)",
        "Compact skeleton (the full operator list is large): the turns "
        "window is the single data shuffle; the two "
        "HashAggregate/Exchange pairs are the tiny conversation-id "
        "distincts.",
        skeleton(extract_triples(spark, turns)),
    ))

    pushed = turns.where(F.col("conv_id") == "conv-00001") \
        .select("conv_id", "turn_idx")
    sections.append((
        "Filter pushdown + column pruning at the scan",
        "PushedFilters reaches the parquet scan; ReadSchema drops the "
        "wide text column.",
        formatted(pushed),
    ))

    docs = spark.range(200).select(
        F.col("id").cast("int").alias("doc_id"),
        F.concat(F.lit("tok"), (F.col("id") % 7).cast("string"),
                 F.lit(" common words here")).alias("text"))
    sections.append((
        "LSH candidate pairs with hot-bucket cap",
        "Bucket widths are counted and broadcast back; oversized "
        "buckets salt on md5('band|id') before the in-bucket self-join "
        "(operators/dedup.py capped_bucket_pairs; md5 not crc32 — CRC "
        "linearity made every band split identically). The "
        "BroadcastExchange is the (band,key)->width table; the "
        "SortMergeJoin keys include _salt.",
        skeleton(lsh_candidate_pairs(docs, max_bucket=16)),
    ))

    emb = spark.range(60).select(
        F.col("id").cast("int").alias("vec_id"),
        F.array(*[(F.col("id") % (i + 2)).cast("double")
                  for i in range(8)]).alias("embedding"))
    sections.append((
        "Embedding near-duplicates with hot-bucket cap",
        "Same capping shape over the hyperplane bucket key.",
        skeleton(embedding_near_duplicates(emb, threshold=0.5,
                                           max_bucket=16, planes=2)),
    ))

    from mms_rdf_spark.operators.packing import pack_documents

    docs2 = spark.range(500).select(
        F.col("id").cast("int").alias("doc_id"),
        F.concat(F.lit("word"), (F.col("id") % 23).cast("string"),
                 F.lit(" the common tail")).alias("text"))
    bench = docs2.where(F.col("doc_id") % 97 == 0)
    from mms_rdf_spark.operators.dedup import decontaminate

    sections.append((
        "Decontamination: benchmark grams broadcast, corpus never shuffles text",
        "Both sides reduce to md5 gram digests; the benchmark side is a "
        "BroadcastExchange.",
        skeleton(decontaminate(docs2, bench)),
    ))

    sections.append((
        "Token-budget packing: one lane exchange reused by both windows",
        "Lane striping is the only shuffle; the (lane, shard) window "
        "reuses the lane partitioning.",
        skeleton(pack_documents(docs2)),
    ))

    from mms_rdf_spark.operators.curate import curate_full

    sections.append((
        "Fused curation recipe: one scan, one exchange",
        "Every signal (quality, lang-ID, repetition, split) is column "
        "math in the scan projection; exact dedup is the row_number "
        "window over md5(text) — its hashpartitioning is the ONLY "
        "exchange (asserted in tests/test_plans.py). Round 2 joined "
        "four per-signal projections back on doc_id; those shuffles "
        "are gone.",
        skeleton(curate_full(docs2)),
    ))

    from mms_rdf_spark.operators.similarity import (
        embedding_near_duplicates_mb,
    )

    sections.append((
        "Multi-band embedding near-duplicates (capped, recoverable)",
        "All band bucket strings computed in ONE scan (array of "
        "structs, exploded); capped in-bucket join shared with text "
        "LSH; band-dependent md5 salt so cross-salt pairs recover in "
        "other bands.",
        skeleton(embedding_near_duplicates_mb(emb, threshold=0.5,
                                              planes=2, bands=2,
                                              max_bucket=16)),
    ))

    from mms_rdf_spark.operators.materialize import write_spo_bucketed

    triples = extract_triples(spark, turns)
    write_spo_bucketed(triples, "spo_plans_demo", buckets=8)
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        tb = spark.table("spo_plans_demo")
        a = tb.where(F.col("predicate") == "rdf:type") \
            .select("subject", F.col("object").alias("cls"))
        b = tb.where(F.col("predicate") == "mms-property:role") \
            .select("subject", F.col("object").alias("role"))
        sections.append((
            "Bucketed SPO subject self-join (no Exchange)",
            "Both sides pre-hashed + pre-sorted on subject at write "
            "time; the BGP join is a per-bucket merge (auto-broadcast "
            "disabled to show the at-scale strategy).",
            skeleton(a.join(b, on="subject")),
        ))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)

    mentions = triples.where(
        F.col("object").startswith("mms-artifact:Mention.ID:"))
    surfaces = distinct_surfaces(mentions)
    comps = connected_components(candidate_edges(surfaces), "src", "dst")
    entities = entity_table(surfaces, comps).localCheckpoint()
    sections.append((
        "Canonical rewrite scoped to the mention slice",
        "Exactly ONE join in the plan — the mention-object branch; the "
        "non-mention remainder is filter+union only (asserted in "
        "tests/test_scale_caps.py). Entity lineage truncated for "
        "legibility.",
        skeleton(rewrite_mentions_canonical(triples, entities)),
    ))

    from mms_rdf_spark.operators.temporal import (
        asof_join,
        range_join_bucketed,
    )

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    right = (ev.where(F.col("event_type") == "purchase")
             .groupBy("user_id", "ts").agg(F.max("value").alias("value")))
    left = (ev.where(F.col("event_type") != "purchase")
            .select("event_id", "user_id", "ts"))
    sections.append((
        "As-of join: one exchange, zero Join nodes",
        "tag -> unionByName -> per-key window scan. The naive "
        "l.ts >= r.ts formulation plans a BroadcastNestedLoopJoin "
        "(quadratic per key); this is a single hash exchange on the "
        "key (asserted in tests/test_temporal.py).",
        skeleton(asof_join(left, right, on="user_id")),
    ))

    iv = (ev.where(F.col("event_type") == "error")
          .select(F.col("event_id").alias("interval_id"), "user_id",
                  F.col("ts").alias("start_ts"),
                  (F.col("ts") + F.expr("INTERVAL 30 MINUTES"))
                  .alias("end_ts")))
    pt = (ev.where(F.col("event_type") == "click")
          .select(F.col("event_id").alias("point_id"), "user_id", "ts"))
    sections.append((
        "Bucketed range join: equi-join, no NestedLoop/Cartesian",
        "Intervals explode to covered epoch buckets; the containment "
        "match is an equi-join on (key, bucket) + residual between "
        "(asserted in tests/test_temporal.py).",
        skeleton(range_join_bucketed(iv, pt, on="user_id")),
    ))

    from mms_rdf_spark.operators.layout import zorder_key
    from mms_rdf_spark.operators.pagerank import triangle_count

    sections.append((
        "Z-order key: pure projection, bounds broadcast only",
        "Morton interleave as JVM bit arithmetic; the only exchanges "
        "are the single-row min/max aggregate and its broadcast — the "
        "corpus never shuffles (asserted in tests/test_layout.py).",
        skeleton(zorder_key(
            ev.select("event_id", "user_id",
                      F.col("value").cast("long").alias("v")),
            "user_id", "v")),
    ))

    tri_edges = (ev.select(F.col("user_id").cast("string").alias("src"),
                           F.col("event_type").alias("dst")))
    sections.append((
        "Triangle count: oriented wedge join, no nested loop",
        "Degree-ordered orientation caps out-degree at O(sqrt m); the "
        "wedge enumeration and closure are hash equi-joins on the "
        "oriented edge list.",
        skeleton(triangle_count(tri_edges)),
    ))

    from mms_rdf_spark.operators.analytics import (
        funnel_steps,
        grouped_zscore_outliers,
    )
    from mms_rdf_spark.operators.skew import bloom_prejoin

    sections.append((
        "Ordered funnel: stacked windows + aggregate, ONE exchange",
        "All conditional-min windows and the final per-key aggregate "
        "share the same hash partitioning; the fact table shuffles "
        "exactly once (asserted in test_analytics.py).",
        skeleton(funnel_steps(
            ev.select("user_id", "event_type", "ts"),
            ["click", "view", "purchase"])),
    ))

    sections.append((
        "Z-score anomalies: broadcast stats, no fact shuffle",
        "The per-group moment sums aggregate to |groups| rows and "
        "broadcast back over the scan; the only exchange is the tiny "
        "stats build.",
        skeleton(grouped_zscore_outliers(
            ev.select("event_id", "event_type", "value"),
            "event_type", "value", "event_id")),
    ))

    sections.append((
        "Bloom prejoin: bitmap probe as one broadcast hash join",
        "The (word, mask) bitmap builds map-side and broadcasts; the "
        "big side probes without any shuffle of its own (asserted in "
        "test_quality_bloom.py).",
        skeleton(bloom_prejoin(
            ev.select("event_id", F.col("user_id").alias("key")),
            ev.select(F.col("event_id").alias("key")).limit(5),
            "key")),
    ))

    from mms_rdf_spark.operators.pagerank import (
        betweenness_centrality,
        louvain,
    )

    g = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("d", "e"),
         ("a", "e"), ("b", "e"), ("e", "a")], "src string, dst string")
    sections.append((
        "Betweenness (pairs accumulation): keyed joins only",
        "After the forward sigma BFS (state localCheckpointed per "
        "round, so it appears as ExistingRDD scans), the Bellman "
        "accumulation is two equi-joins on (v) and (s, t) plus one "
        "DECIMAL-sum aggregate — no crossJoin, nothing collected "
        "(tests/test_betweenness.py pins the values).",
        skeleton(betweenness_centrality(g, method="pairs")),
    ))

    sections.append((
        "Louvain (final relabel over checkpointed rounds)",
        "Each local-move round is one labels-to-adjacency join + two "
        "map-side-combined aggregates + a per-node argmax window, all "
        "localCheckpointed (the plan shows the final min-member "
        "relabel join over the checkpointed mapping; the per-round "
        "shape is asserted by the bit-exact pure-Python twin).",
        skeleton(louvain(g, levels=1, move_rounds=1)),
    ))

    from mms_rdf_spark.operators.dedup import duplicated_spans

    sections.append((
        "Substring-level exact dedup (hash-only count shuffle)",
        "The duplicate-test aggregate is map-side combined on "
        "xxhash64 only (8-byte rows move, never the L-token gram "
        "strings); the >=2 hash set comes back as a LeftSemi; the "
        "exact-gram confirm window and the gaps-and-islands merge "
        "run over the bounded survivor set "
        "(tests/test_plans.py::test_dup_spans_count_shuffle_is_"
        "hash_only).",
        skeleton(duplicated_spans(docs2, length=3)),
    ))

    from mms_rdf_spark.operators.pagerank import square_counts

    edges40 = spark.range(40).select(
        (F.col("id") % 8).alias("src"), (F.col("id") % 5).alias("dst"))
    sections.append((
        "4-cycle counts: wedge self-join pinned against AQE",
        "Both sides of the middle-vertex self-join carry the explicit "
        "hashpartitioning pin (skew.pin_fanout_partitions) — hub "
        "wedges fan out quadratically while the input is bytes-tiny, "
        "exactly the AQE coalescing blind spot "
        "(tests/test_plans.py::test_square_wedge_join_partitioning_"
        "pinned_against_aqe).",
        skeleton(square_counts(edges40)),
    ))

    out = ["# PLANS — captured physical plans (evidence for SCALE.md "
           "claims)", "",
           "Regenerated by `python tools/dump_plans.py` from live "
           "`explain(\"formatted\")`", "on the committed code; the "
           "properties asserted in tests/test_plans.py and",
           "tests/test_scale_caps.py are visible here directly.", ""]
    for title, blurb, plan in sections:
        out += [f"## {title}", "", blurb, "", "```", plan, "```", ""]
    (REPO / "PLANS.md").write_text("\n".join(out))
    print(f"wrote {REPO / 'PLANS.md'} ({len(sections)} sections)")
    spark.stop()


if __name__ == "__main__":
    main()
