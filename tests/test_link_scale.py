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


def test_cross_salt_recall_pinned(spark):
    """Measure (not assume) the sub-salting recall trade: both blocking
    passes overflow MAX_BLOCK so salting engages in BOTH, and every
    seeded near-duplicate pair differs exactly at one pass's salt
    character — the other pass must recover it (multi-pass blocking,
    NOTES.md §2 / link.py docstring)."""
    import hashlib

    from mms_rdf_spark.operators.link import MAX_BLOCK

    # all norms: length 12, prefix 'ab', suffix 'yz' -> one prefix
    # block AND one suffix block, both oversized
    def mid(i: int) -> str:
        h = hashlib.md5(str(i).encode()).hexdigest()
        return "".join(c for c in h if c.isalpha())[:8].ljust(8, "q")

    filler = [f"ab{mid(i)}yz" for i in range(MAX_BLOCK + 300)]
    seeded: list[tuple[str, str]] = []
    for i in range(15):
        core = mid(10_000 + i)[:7]
        # differ at position 2 = the prefix pass's salt char
        seeded.append((f"abc{core}yz", f"abd{core}yz"))
    for i in range(15):
        core = mid(20_000 + i)[:7]
        # differ at position 9 = the suffix pass's salt char
        seeded.append((f"ab{core}cyz", f"ab{core}dyz"))

    surfaces = list({s for p in seeded for s in p} | set(filler))
    assert len(surfaces) > MAX_BLOCK  # salting must engage
    df = spark.createDataFrame([(s, s, 1) for s in surfaces],
                               "surface string, norm string, freq int")
    edges = candidate_edges(df)
    found = {frozenset((r["src"], r["dst"])) for r in edges.collect()}
    recalled = sum(1 for a, b in seeded if frozenset((a, b)) in found)
    recall = recalled / len(seeded)
    assert recall >= 0.95, (recall, [p for p in seeded
                                     if frozenset(p) not in found])
