"""The P/R gate (BASELINE.json `metric`): Spark extraction vs the
single-process reference-semantics oracle, exact tuple match on
(subject, predicate, object, object_is_iri, datatype, lang, idx).
Target >= 0.95; the implementations are expected to agree exactly."""

from __future__ import annotations

import pyspark.sql.functions as F

from mms_rdf_spark.oracle import GOLDEN_COLUMNS, precision_recall, triple_keyset


def test_relational_extractor_pr(triples_df, golden):
    got = triples_df.toPandas()
    p, r = precision_recall(got[GOLDEN_COLUMNS], golden)
    assert p >= 0.95 and r >= 0.95, (p, r)
    assert (p, r) == (1.0, 1.0)


def test_arrow_extractor_matches_relational(spark, transcripts_df, triples_df):
    from mms_rdf_spark.operators.extract import extract_turn_triples_arrow

    arrow = extract_turn_triples_arrow(spark, transcripts_df).toPandas()
    relational_turn_level = (
        triples_df.where(F.col("subject").contains(".Turn."))
        .toPandas()
    )
    a = triple_keyset(arrow[GOLDEN_COLUMNS])
    b = triple_keyset(relational_turn_level[GOLDEN_COLUMNS])
    assert a == b


def test_per_turn_text_equality_invariant(spark, transcripts_df, triples_df):
    """input_hint invariant: per-turn text is preserved exactly under
    the stable (conv_id, turn_idx) ordering — every non-null text value
    round-trips into exactly its turn's mms-property:text triple."""
    texts = transcripts_df.select(
        "conv_id", "turn_idx", F.col("text").alias("want")
    ).where(F.col("text").isNotNull())
    got = triples_df.where(F.col("predicate") == "mms-property:text").select(
        "conv_id", "turn_idx", F.col("object").alias("got")
    )
    joined = texts.join(got, on=["conv_id", "turn_idx"], how="full")
    mismatches = joined.where(
        ~F.col("want").eqNullSafe(F.col("got"))
    ).count()
    assert mismatches == 0


def test_ordered_mentions_stable_under_repartition(spark, transcripts_df):
    """R9/W1: list order must come from data, not partition iteration —
    extraction over a shuffled input yields identical idx assignments."""
    from mms_rdf_spark.operators.extract import extract_triples

    base = extract_triples(spark, transcripts_df)
    shuffled = extract_triples(spark, transcripts_df.repartition(13))
    key = ["subject", "predicate", "object", "idx"]
    a = {tuple(r) for r in base.where(F.col("idx").isNotNull())
         .select(key).collect()}
    b = {tuple(r) for r in shuffled.where(F.col("idx").isNotNull())
         .select(key).collect()}
    assert a == b
