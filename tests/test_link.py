"""Entity linking: near-duplicate surfaces resolve to exactly the
seeded clusters; blocking + salting keep candidate pairs bounded."""

from __future__ import annotations

import pyspark.sql.functions as F

from mms_rdf_spark.operators.cc import connected_components
from mms_rdf_spark.operators.link import (
    candidate_edges,
    distinct_surfaces,
    entity_table,
)
from mms_rdf_spark.synth import ENTITY_CLUSTERS


def _entities(spark, triples_df):
    mentions = triples_df.where(F.col("predicate") == "mms-property:mentions")
    surfaces = distinct_surfaces(mentions)
    comps = connected_components(candidate_edges(surfaces), "src", "dst")
    return entity_table(surfaces, comps)


def test_clusters_resolve_exactly(spark, triples_df):
    from mms_rdf_spark.functions import sanitize_suffix

    ents = _entities(spark, triples_df).toPandas()
    # linking operates on sanitized surfaces (they come from minted
    # mention IRIs); every seeded cluster collapses to one entity id
    surface_to_entity = dict(zip(ents.surface, ents.entity_id))
    for cluster in ENTITY_CLUSTERS:
        ids = {surface_to_entity[sanitize_suffix(s)]
               for s in cluster if sanitize_suffix(s) in surface_to_entity}
        assert len(ids) == 1, (cluster, ids)
    # and distinct entities == number of seeded clusters present
    present = ents.entity_id.nunique()
    assert present == len(ENTITY_CLUSTERS)


def test_canonical_iri_is_deterministic(spark, triples_df):
    a = _entities(spark, triples_df).orderBy("surface").toPandas()
    b = _entities(spark, triples_df).orderBy("surface").toPandas()
    assert a.equals(b)


def test_mention_frequency_carried(spark, triples_df):
    surfaces = distinct_surfaces(
        triples_df.where(F.col("predicate") == "mms-property:mentions"))
    total_mentions = triples_df.where(
        F.col("predicate") == "mms-property:mentions").count()
    assert surfaces.agg(F.sum("freq")).collect()[0][0] == total_mentions


def test_global_rank_matches_single_window(spark):
    from pyspark.sql.window import Window

    from mms_rdf_spark.operators.link import global_rank

    rows = [(f"s{i:03d}", f"n{(i * 17) % 50:02d}") for i in range(200)]
    df = spark.createDataFrame(rows, "surface string, norm string") \
        .repartition(8)
    got = {r["surface"]: r["rank"] for r in
           global_rank(df, "norm", "surface").collect()}
    w = Window.orderBy("norm", "surface")
    want = {r["surface"]: r["rank"] for r in
            df.withColumn("rank", F.row_number().over(w).cast("long"))
            .collect()}
    assert got == want


def test_sorted_neighborhood_pairs_adjacency(spark):
    from mms_rdf_spark.operators.link import sorted_neighborhood_pairs

    # typo family normalizes adjacent; unrelated string sorts away
    rows = [("GPT-4", "gpt4"), ("gpt_4", "gpt4"), ("gpt 4!", "gpt4"),
            ("zebra", "zebra"), ("aardvark", "aardvark")]
    df = spark.createDataFrame(rows, "surface string, norm string")
    pairs = {(r["a_id"], r["b_id"]) for r in
             sorted_neighborhood_pairs(df, window=1).collect()}
    # window=1 chains the sort order: each consecutive pair once
    assert len(pairs) == 4
    # the gpt4 family (ties broken by surface) is chained together
    assert ("GPT-4", "gpt 4!") in pairs and ("gpt 4!", "gpt_4") in pairs


def test_link_mentions_composition_matches_manual(spark, triples_df):
    """link_mentions (the checkpointed library composition used by the
    pipeline stage and bench) row-matches the hand-wired stages."""
    from mms_rdf_spark.operators.link import link_mentions

    mentions = triples_df.where(F.col("predicate") == "mms-property:mentions")
    got = link_mentions(mentions).orderBy("surface").toPandas()
    ref = _entities(spark, triples_df).orderBy("surface").toPandas()
    assert got.equals(ref)


def test_fellegi_sunter_scores(spark):
    import math

    from mms_rdf_spark.operators.link import fellegi_sunter_scores

    # one block; ids 1/2 are a true near-match that AGREES on brand,
    # 3/4/5 are distinct names disagreeing on brand with the others
    rows = [
        (1, "widget alpha", "B1", "blk"),
        (2, "widget alphb", "B1", "blk"),   # dist 1 -> match
        (3, "gizmo total", "B2", "blk"),
        (4, "sprocket heavy", "B3", "blk"),
        (5, "doohickey fine", "B4", "blk"),
    ]
    df = spark.createDataFrame(
        rows, "id int, name string, brand string, blk string")
    out = fellegi_sunter_scores(
        df, "id", "blk", ["brand"], "name", label_max_dist=2)
    got = {(r.id_a, r.id_b): r for r in out.collect()}
    assert len(got) == 10  # C(5,2) within the single block
    assert got[(1, 2)].is_match and not got[(1, 3)].is_match
    # m = (1+.5)/(1+1) = .75, u = (0+.5)/(9+1) = .05
    w_agree = round(math.log(0.75 / 0.05), 9)
    w_dis = round(math.log(0.25 / 0.95), 9)
    assert abs(got[(1, 2)].score - round(w_agree, 6)) < 1e-9
    assert abs(got[(1, 3)].score - round(w_dis, 6)) < 1e-9
    # agreement outranks disagreement
    assert got[(1, 2)].score > got[(1, 3)].score


def test_fellegi_sunter_max_block_drops(spark):
    from mms_rdf_spark.operators.link import fellegi_sunter_scores

    rows = [(i, f"name {i}", "B", "hot") for i in range(6)] \
        + [(10, "cold x", "B", "cold"), (11, "cold y", "B", "cold")]
    df = spark.createDataFrame(
        rows, "id int, name string, brand string, blk string")
    out = fellegi_sunter_scores(
        df, "id", "blk", ["brand"], "name", max_block=5)
    pairs = {(r.id_a, r.id_b) for r in out.collect()}
    assert pairs == {(10, 11)}  # the 6-member hot block is dropped


def test_fs_em_learns_informative_feature(spark):
    from mms_rdf_spark.operators.link import fellegi_sunter_em

    # duplicates share the brand; non-matching pairs mostly disagree:
    # EM must drive m_brand above u_brand without any label
    rows = []
    for i in range(8):  # 8 duplicate pairs agreeing on brand
        rows.append((2 * i, f"item {i}", f"B{i}", "blk"))
        rows.append((2 * i + 1, f"item {i}x", f"B{i}", "blk"))
    df = spark.createDataFrame(
        rows, "id int, name string, brand string, blk string")
    out = {r["param"]: r["value"]
           for r in fellegi_sunter_em(
               df, "id", "blk", ["brand"], "name", iters=3).collect()}
    assert set(out) == {"lambda", "m_brand", "u_brand"}
    assert out["m_brand"] > out["u_brand"]
    assert 0 < out["lambda"] < 1
    for v in out.values():
        assert 1e-6 <= v <= 1 - 1e-6


def test_fs_em_deterministic_and_clamped(spark):
    from mms_rdf_spark.operators.link import fellegi_sunter_em

    # ALL pairs agree on the only feature -> u is pulled toward its
    # ceiling but stays inside the clamp; re-run is bit-identical
    rows = [(i, f"n{i}", "SAME", "blk") for i in range(5)]
    df = spark.createDataFrame(
        rows, "id int, name string, brand string, blk string")
    r1 = sorted(map(tuple, fellegi_sunter_em(
        df, "id", "blk", ["brand"], "name", iters=4).collect()))
    r2 = sorted(map(tuple, fellegi_sunter_em(
        df, "id", "blk", ["brand"], "name", iters=4).collect()))
    assert r1 == r2
    vals = dict(r1)
    assert vals["m_brand"] <= 1 - 1e-6 and vals["u_brand"] <= 1 - 1e-6
