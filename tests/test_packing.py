"""Offset packing + decontamination semantics."""

from __future__ import annotations

import pyspark.sql.functions as F

from mms_rdf_spark.operators.dedup import decontaminate
from mms_rdf_spark.operators.packing import pack_documents


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string")


def test_pack_single_lane_boundaries(spark):
    # 4 docs x 3 tokens, budget 5, one lane: offsets 0,3,6,9 ->
    # shards 0,0,1,1
    docs = _docs(spark, ["a b c"] * 4)
    out = pack_documents(docs, budget=5, groups=1).collect()
    by_doc = {r["doc_id"]: (r["shard_id"], r["pos_in_shard"]) for r in out}
    assert by_doc == {0: ("0#0", 1), 1: ("0#0", 2),
                      2: ("0#1", 1), 3: ("0#1", 2)}


def test_pack_overflow_bounded_by_one_doc(spark):
    # each shard's token total exceeds budget by at most one doc
    texts = [" ".join(["t"] * (3 + i % 7)) for i in range(200)]
    docs = _docs(spark, texts)
    out = pack_documents(docs, budget=32, groups=4)
    shard_tokens = (out.groupBy("shard_id")
                    .agg(F.sum("n_tokens").alias("total"),
                         F.max("n_tokens").alias("biggest")).collect())
    for r in shard_tokens:
        assert r["total"] < 32 + r["biggest"], r


def test_pack_lanes_are_independent(spark):
    docs = _docs(spark, ["x y"] * 40)
    out = pack_documents(docs, budget=8, groups=4)
    lanes = {r["lane"] for r in out.collect()}
    assert lanes == {0, 1, 2, 3}
    # every doc appears exactly once
    assert out.count() == 40
    assert out.select("doc_id").distinct().count() == 40


def test_decontaminate_flags_exact_leak(spark):
    bench = _docs(spark, ["the quick brown fox jumps over the lazy dog"])
    train = spark.createDataFrame(
        [(10, "prefix the quick brown fox jumps over something"),
         (11, "completely unrelated words with no overlap at all here"),
         (12, "over the lazy dog jumps nothing shared of length five")],
        "doc_id int, text string")
    hits = {r["doc_id"]: r["n_hits"]
            for r in decontaminate(train, bench, n=5).collect()}
    assert 10 in hits and hits[10] >= 1   # shares a 5-gram
    assert 11 not in hits                 # clean
    assert 12 not in hits                 # only a 4-gram overlap


def test_langid_multi_classifies_languages(spark):
    from mms_rdf_spark.operators.textstats import detect_language_multi

    docs = spark.createDataFrame([
        (0, "the cat and the dog is in a house of it"),
        (1, "der hund und die katze ist nicht ein tier zu haus"),
        (2, "le chat et le chien est un animal des villes que je vois"),
        (3, "el perro y la gata es un animal de las casas que veo"),
        (4, "zzz qqq www eee rrr ttt yyy uuu"),
    ], "doc_id int, text string")
    got = {r["doc_id"]: r["lang_pred"]
           for r in detect_language_multi(docs).collect()}
    assert got == {0: "en", 1: "de", 2: "fr", 3: "es", 4: "other"}


def test_split_assignment_stable_and_weighted(spark):
    from mms_rdf_spark.operators.packing import assign_splits

    docs = spark.range(20000).selectExpr("cast(id as int) doc_id",
                                         "'x' as text")
    a = assign_splits(docs).collect()
    b = assign_splits(docs).collect()  # re-run: identical (no rand())
    assert {(r["doc_id"], r["split"]) for r in a} == \
        {(r["doc_id"], r["split"]) for r in b}
    counts = {}
    for r in a:
        counts[r["split"]] = counts.get(r["split"], 0) + 1
    assert abs(counts["train"] / 20000 - 0.98) < 0.01
    assert 0.003 < counts["valid"] / 20000 < 0.02
    assert 0.003 < counts["test"] / 20000 < 0.02

    import pytest as _pytest
    with _pytest.raises(ValueError):
        assign_splits(docs, {"train": 50, "valid": 10})


def test_repetition_stats_flags_boilerplate(spark):
    from mms_rdf_spark.operators.textstats import repetition_stats

    docs = spark.createDataFrame(
        [(0, "buy now " * 30), (1, "a perfectly normal varied sentence "
                                   "with mostly unique word pairs here")],
        "doc_id int, text string")
    got = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    assert got[0]["repetitive"] and got[0]["dup_ratio"] > 0.9
    assert not got[1]["repetitive"]


def test_redact_pii(spark):
    from mms_rdf_spark.operators.textstats import redact_pii

    docs = spark.createDataFrame([
        (0, "contact jane.doe@example.com or visit https://ex.org/a_b"),
        (1, "call +1-555-123-4567 about ssn 123-45-6789 today"),
        (2, "nothing sensitive here"),
    ], "doc_id int, text string")
    got = {r["doc_id"]: r for r in redact_pii(docs).collect()}
    assert got[0]["redacted"] == "contact [EMAIL] or visit [URL]"
    assert got[0]["n_redactions"] == 2
    assert "[PHONE]" in got[1]["redacted"] and "[SSN]" in got[1]["redacted"]
    assert "4567" not in got[1]["redacted"]
    assert "6789" not in got[1]["redacted"]
    assert got[2]["redacted"] == "nothing sensitive here"
    assert got[2]["n_redactions"] == 0


def test_stratified_sample_rates_and_determinism(spark):
    from mms_rdf_spark.operators.packing import stratified_sample

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    out = stratified_sample(docs, rates={"src0": 100, "src1": 0})
    kept = {r["source"]: 0 for r in out.collect()}
    for r in out.collect():
        kept[r["source"]] = kept.get(r["source"], 0) + 1
    assert kept.get("src0") == 25      # 100% stratum fully kept
    assert "src1" not in kept          # 0% stratum fully dropped
    # other strata at the 25% default: binomial(25, .25) stays in range
    others = [v for k, v in kept.items() if k not in ("src0", "src1")]
    assert others and all(0 <= v <= 18 for v in others)
    # purely id/stratum-hash based -> identical under repartition
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(r["doc_id"] for r in
               stratified_sample(docs.repartition(7),
                                 rates={"src0": 100, "src1": 0}).collect())
    assert a == b


def test_weighted_sample_prefers_heavy_rows_deterministically(spark):
    from mms_rdf_spark.operators.packing import weighted_sample

    # 200 light rows (w=1) vs 20 heavy rows (w=1000): heavy rows should
    # dominate the sample despite being 10x rarer
    rows = [(i, 1) for i in range(200)] + \
           [(1000 + i, 1000) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = [r["doc_id"] for r in weighted_sample(df, "w", n=20).collect()]
    heavy = sum(1 for d in got if d >= 1000)
    assert heavy >= 15, got  # P(this failing under proportionality) ~ 0
    # deterministic across partitionings
    again = [r["doc_id"] for r in
             weighted_sample(df.repartition(7), "w", n=20).collect()]
    assert got == again
    # zero/negative weights never selected
    z = spark.createDataFrame([(1, 0), (2, -5), (3, 10)],
                              "doc_id long, w long")
    assert [r["doc_id"] for r in
            weighted_sample(z, "w", n=5).collect()] == [3]


def test_length_bucketed_batches_cut_padding(spark):
    """Length-sorted batches must waste strictly fewer padding tokens
    than id-ordered batches on a mixed-length corpus, partition
    batches exactly (size = batch_size except the tail), and assign
    deterministically under repartitioning."""
    import pyspark.sql.functions as F

    from mms_rdf_spark.operators.packing import (length_bucketed_batches,
                                                 padding_waste)

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    b = length_bucketed_batches(docs, batch_size=16)
    n = docs.count()
    sizes = {r["n"] for r in
             b.groupBy("batch_id").agg(F.count("*").alias("n"))
             .collect()}
    assert sizes <= {16, n % 16 or 16}
    smart = padding_waste(b).agg(F.sum("pad_tokens")).first()[0]
    naive = padding_waste(
        docs.select("doc_id",
                    F.size(F.filter(F.split("text", r"\s+"),
                                    lambda t: t != "")).alias("n_tokens"),
                    F.floor((F.col("doc_id") % 1000000) / 16)
                    .alias("batch_id"))).agg(F.sum("pad_tokens")).first()[0]
    assert smart < naive, (smart, naive)
    again = length_bucketed_batches(docs.repartition(13), batch_size=16)
    assert sorted(map(tuple, b.collect())) == \
        sorted(map(tuple, again.collect()))
