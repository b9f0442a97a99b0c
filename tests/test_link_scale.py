"""Entity linking at a linking-meaningful scale: a programmatic
entity pool with Zipf-skewed popularity (hot entities) — every variant
cluster must still collapse to exactly one entity, and the hot-block
salting must keep candidate pairs bounded."""

from __future__ import annotations

import pyspark.sql.functions as F

from mms_rdf_spark.functions import sanitize_suffix
from mms_rdf_spark.operators.cc import connected_components
from mms_rdf_spark.operators.link import (
    candidate_edges,
    distinct_surfaces,
    entity_table,
)
from mms_rdf_spark.operators.extract import extract_triples
from mms_rdf_spark.synth import entity_pool, make_transcripts


def test_zipf_entity_pool_links_exactly(spark):
    pool_n = 400
    pdf = make_transcripts(n_convs=400, hot_conv_turns=100,
                           n_entities=pool_n)
    triples = extract_triples(spark, spark.createDataFrame(pdf))
    mentions = triples.where(F.col("predicate") == "mms-property:mentions")
    surfaces = distinct_surfaces(mentions)
    comps = connected_components(candidate_edges(surfaces), "src", "dst")
    ents = entity_table(surfaces, comps).toPandas()

    surface_to_entity = dict(zip(ents.surface, ents.entity_id))
    seen_entities: list[str] = []
    n_clusters_present = 0
    for cluster in entity_pool(pool_n):
        ids = {surface_to_entity[sanitize_suffix(s)]
               for s in cluster if sanitize_suffix(s) in surface_to_entity}
        if ids:
            assert len(ids) == 1, (cluster, ids)  # no splits
            n_clusters_present += 1
            seen_entities.extend(ids)
    # distinct ids == clusters present: no merging ACROSS clusters either
    assert len(set(seen_entities)) == n_clusters_present
    assert ents.entity_id.nunique() == n_clusters_present

    # Zipf skew materialized: the hottest entity dominates
    freq = ents.groupby("entity_id").freq.sum().sort_values(ascending=False)
    assert freq.iloc[0] > 5 * freq.iloc[len(freq) // 2]


def test_candidate_pairs_bounded_under_skew(spark):
    """All programmatic surfaces share the 'en'/... norm prefixes —
    one hot block. The sub-block salt must keep the pair count far
    below the quadratic bound."""
    pdf = make_transcripts(n_convs=300, hot_conv_turns=50, n_entities=300)
    triples = extract_triples(spark, spark.createDataFrame(pdf))
    surfaces = distinct_surfaces(
        triples.where(F.col("predicate") == "mms-property:mentions"))
    n = surfaces.count()
    pairs = candidate_edges(surfaces).count()
    assert pairs < n * 50, (n, pairs)  # far below n^2
