"""Entity linking: mention surfaces -> similarity edges -> entities.

The reference links records only by exact id (IRI minting is identity:
triplifier.js:24-58) and patches dangling references after the fact
(src/action/ammend.js). The north rule upgrades this to real entity
resolution: near-duplicate mention surfaces ("Apache_Spark",
"apache_spark", "APACHE SPARK") must canonicalize to one entity.

Stages (all DataFrame ops, designed for 10^12-turn inputs):
  1. distinct surfaces — the working set collapses from |mentions|
     (potentially trillions) to |distinct surfaces| BEFORE any
     expensive work: a groupBy(surface).count() that also yields the
     mention frequency used for skew decisions.
  2. blocking — each surface gets a block key (first 2 chars of the
     normalized form + length bucket). Pairs are only generated within
     a block: the classic O(n^2) -> O(sum b_i^2) cut.
  3. candidate self-join within block with a.surface < b.surface
     (dedup + no self-pairs). Hot blocks are the skew risk: we salt by
     splitting oversized blocks on a hash of the THIRD character
     (sub-blocking), and AQE skew-join splitting covers the residue.
  4. scoring — character-3-gram Jaccard, entirely built-in
     (transform/sequence/substring + array_intersect/union): no UDF.
  5. edges(src, dst) for surfaces with jaccard >= threshold, plus the
     implicit same-normalized-form edges (exact match after
     normalization is always a link).

Canonicalization (cc.py) then labels each surface with its component
min, and `entity_table` mints canonical IRIs.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mms_rdf_spark.functions.iri import sanitize_suffix_col

DEFAULT_JACCARD = 0.55
MAX_BLOCK = 2000  # surfaces per (block, sub_block) before salting again


def normalize_surface(c) -> F.Column:
    """lower + strip non-alphanumerics: the normalization both the
    linker and the oracle tests agree on."""
    return F.regexp_replace(F.lower(c), r"[^a-z0-9]", "")


def distinct_surfaces(mention_triples: DataFrame) -> DataFrame:
    """mention triples (object = mms-artifact:Mention.ID:<surface>) ->
    (surface, norm, freq). Frequency is carried so downstream stages
    can reason about hot entities."""
    return (
        mention_triples
        .select(F.regexp_extract("object", r"^mms-artifact:Mention\.ID:(.*)$", 1)
                .alias("surface"))
        .where(F.col("surface") != "")
        .groupBy("surface")
        .agg(F.count(F.lit(1)).alias("freq"))
        .withColumn("norm", normalize_surface(F.col("surface")))
    )


def _ngrams(col, n: int = 3) -> F.Column:
    """distinct character n-grams of a string column (built-in only)."""
    padded = F.concat(F.lit("^"), col, F.lit("$"))
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(padded) - (n - 1), F.lit(1))),
            lambda i: F.substring(padded, i, n),
        )
    )


def blocking_keys() -> list:
    """The multi-pass blocking-key expressions over a `norm` column
    (prefix bigram / suffix bigram, each with a length bucket).

    Single source of truth: `candidate_edges` blocks on these, and the
    incremental linker's anchor pruning (streaming/link.py) explodes
    the SAME expressions — keeping them in one place makes drift
    (silently missed entity adoption) impossible."""
    len_bucket = (F.length("norm") / 4).cast("int").cast("string")
    return [
        F.concat(F.lit("p#"), F.substring("norm", 1, 2), F.lit("#"),
                 len_bucket),
        F.concat(F.lit("s#"), F.substring(F.col("norm"), -2, 2),
                 F.lit("#"), len_bucket),
    ]


def candidate_edges(
    surfaces: DataFrame,
    jaccard_threshold: float = DEFAULT_JACCARD,
) -> DataFrame:
    """surfaces(surface, norm) -> similarity edges (src, dst, score).

    Two tiers:
      - exact-norm edges: same normalized form => link, no scoring.
        Done as a groupBy(norm) min-surface join (no pair blowup even
        when one norm has millions of surface variants).
      - fuzzy edges: within (block, salt) candidate pairs scored by
        3-gram Jaccard.
    """
    # materialize the collapsed surface table and its per-norm
    # representative ONCE: tier 1 references both, and each blocking
    # pass re-derives `reps` from norm_rep — without the checkpoints
    # every reference re-runs the upstream surface extraction (at
    # sf0.1 the kg_link_cc composition re-scanned the staged triples
    # parquet 6x for a 5-row surface table). Both frames are
    # entity-surface-sized (the lightweight proxy, never the corpus).
    s = (surfaces.select("surface", "norm")
         .where(F.col("norm") != "").distinct().localCheckpoint())

    # tier 1: all surfaces sharing a norm link to the norm's min surface
    # (star topology — CC collapses it; avoids quadratic within-norm pairs)
    norm_rep = s.groupBy("norm").agg(F.min("surface").alias("rep")) \
        .localCheckpoint()
    exact_edges = (
        s.join(norm_rep, on="norm")
        .where(F.col("surface") != F.col("rep"))
        .select(F.col("rep").alias("src"), F.col("surface").alias("dst"),
                F.lit(1.0).alias("score"))
    )

    # tier 2: fuzzy pairs between DISTINCT norms, MULTI-PASS blocking —
    # two independent keys (prefix bigram, suffix bigram), each with
    # hot-block sub-salting. A true pair is lost only if it crosses
    # salts inside oversized blocks under BOTH keys; classic multi-pass
    # blocking keeps recall while each pass stays O(sum b_i^2).
    #
    # Both passes run in ONE exploded-key self-join: each norm emits a
    # (ki, block, salt_char) row per blocking key, the key index rides
    # the join keys so cross-key pairs never meet, and a pair matched
    # under both keys appears twice exactly as the old two-pass union
    # did (the trailing distinct dedupes either way). Same pair set,
    # half the aggregate/broadcast/join stages.
    reps = norm_rep.select(F.col("norm"), F.col("rep")) \
        .withColumn("grams", _ngrams(F.col("norm")))
    block_keys = blocking_keys()
    salt_chars = [F.substring("norm", 3, 1),
                  F.substring(F.col("norm"), -3, 1)]
    blocked = reps.select(
        "norm", "rep", "grams",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("ki"), bk.alias("block"),
                     sc.alias("salt_char"))
            for i, (bk, sc) in enumerate(zip(block_keys, salt_chars))
        ])).alias("bk")
    ).select("norm", "rep", "grams",
             F.col("bk.ki").alias("ki"), F.col("bk.block").alias("block"),
             F.col("bk.salt_char").alias("salt_char"))
    # sub-block salting: blocks over MAX_BLOCK norms split on a hash
    # of a data-derived char; caps the worst block at ~MAX_BLOCK^2/16
    # pairs, AQE skew-join covers the residue. Only the OVERSIZED
    # block widths are broadcast (rows in healthy blocks miss the left
    # join: salt 0) — the full width table is norm-count-sized at
    # scale, an OOM as a broadcast.
    big_blocks = (blocked.groupBy("ki", "block")
                  .agg(F.count(F.lit(1)).alias("_bn"))
                  .where(F.col("_bn") > MAX_BLOCK))
    blocked = (blocked.join(F.broadcast(big_blocks), on=["ki", "block"],
                            how="left")
               .withColumn("salt",
                           F.when(F.col("_bn").isNotNull(),
                                  F.crc32(F.col("salt_char")) % 16)
                           .otherwise(F.lit(0)))
               .drop("_bn", "salt_char"))
    # pin the pair exchange — AQE byte-based coalescing is blind
    # to the quadratic in-block fan-out (skew.pin_fanout_partitions)
    from mms_rdf_spark.operators.skew import pin_fanout_partitions
    blocked = pin_fanout_partitions(blocked, "ki", "block", "salt")
    a, b = blocked.alias("a"), blocked.alias("b")
    fuzzy = (
        a.join(b, (F.col("a.ki") == F.col("b.ki"))
               & (F.col("a.block") == F.col("b.block"))
               & (F.col("a.salt") == F.col("b.salt"))
               & (F.col("a.norm") < F.col("b.norm")))
        .select(
            F.col("a.rep").alias("src"), F.col("b.rep").alias("dst"),
            (F.size(F.array_intersect("a.grams", "b.grams"))
             / F.size(F.array_union("a.grams", "b.grams")))
            .alias("score"))
        .where(F.col("score") >= jaccard_threshold).distinct()
    )
    return exact_edges.unionByName(fuzzy)


def entity_table(surfaces: DataFrame, components: DataFrame) -> DataFrame:
    """(surface, norm, freq) x (node=surface, component) ->
    entities(surface, entity_id, canonical_iri).

    canonical id = min norm within the component (deterministic, data-
    derived); singleton surfaces (no edges -> absent from components)
    become their own entity."""
    # labeled is consumed twice (the canonical-id aggregate and the
    # final join) — checkpoint so the surface/component join runs once
    labeled = (
        surfaces.join(components.withColumnRenamed("node", "surface"),
                      on="surface", how="left")
        .withColumn("component", F.coalesce("component", "surface"))
        .localCheckpoint()
    )
    canon = (
        labeled.groupBy("component")
        .agg(F.min("norm").alias("entity_id"))
    )
    return (
        labeled.join(canon, on="component")
        .select(
            "surface", "norm", "freq", "entity_id",
            F.concat(F.lit("mms-element:Entity."),
                     sanitize_suffix_col(F.col("entity_id"))).alias("canonical_iri"),
        )
    )


def global_rank(df: DataFrame, order_col: str, id_col: str) -> DataFrame:
    """Dense global position under the total order (order_col, id_col),
    computed WITHOUT a single-partition window: repartitionByRange on
    the order key, rank within each partition, then add per-partition
    offsets (a collected list of partition counts — P integers, not
    data). The standard distributed global-index pattern; deterministic
    because the order is total."""
    from pyspark.sql.window import Window

    clash = [c for c in df.columns if c in ("_pid", "_lrank", "_off",
                                            "rank")]
    if clash:
        raise ValueError(f"global_rank: input columns {clash} collide "
                         "with reserved internal names; rename first")
    ranged = df.repartitionByRange(F.col(order_col), F.col(id_col))
    part = ranged.withColumn("_pid", F.spark_partition_id())
    w = Window.partitionBy("_pid").orderBy(order_col, id_col)
    local = part.withColumn("_lrank", F.row_number().over(w))
    sizes = {r["_pid"]: r["n"] for r in
             local.groupBy("_pid").agg(F.count(F.lit(1)).alias("n"))
             .collect()}
    offsets, acc = [], 0
    for pid in sorted(sizes):
        offsets.append((pid, acc))
        acc += sizes[pid]
    # broadcast-join the P offsets (a P-row frame) instead of folding
    # them into a P-branch CASE expression — identical result, but the
    # expression tree stays O(1) at any partition count
    off_df = df.sparkSession.createDataFrame(
        offsets or [(0, 0)], "_pid int, _off long")
    return (local.join(F.broadcast(off_df), on="_pid", how="left")
            .withColumn("rank",
                        (F.col("_lrank")
                         + F.coalesce(F.col("_off"), F.lit(0)))
                        .cast("long"))
            .drop("_pid", "_lrank", "_off"))


def sorted_neighborhood_pairs(
    surfaces: DataFrame,
    key: str = "norm",
    id_col: str = "surface",
    window: int = 2,
) -> DataFrame:
    """Sorted-neighborhood blocking (the classic entity-resolution
    alternative to key blocking): sort all surfaces by `key`, pair each
    with its next `window` neighbors in sort order. Near-identical
    strings land adjacent after normalization, so candidate volume is
    n*window — linear, skew-free, and complementary to gram blocking
    (catches prefix-typo families the gram blocks may split).

    Pairing is the bucketed-range-join trick in rank space: each row
    explodes to (rank + 1 .. rank + window) probe positions and
    equi-joins the neighbor's own rank — no inequality join, no
    single-partition window (ranks come from global_rank). Returns
    (a_id, b_id, a_rank, b_rank)."""
    ranked = global_rank(
        surfaces.select(F.col(id_col).alias("_id"), F.col(key)),
        key, "_id")
    probes = ranked.select(
        F.col("_id").alias("a_id"), F.col("rank").alias("a_rank"),
        F.explode(F.sequence(F.col("rank") + 1,
                             F.col("rank") + window)).alias("rank"))
    return (probes.join(ranked.select(F.col("_id").alias("b_id"),
                                      "rank"), on="rank")
            .select("a_id", "b_id", "a_rank",
                    F.col("rank").alias("b_rank")))


def fuzzy_edit_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_col: str,
    max_dist: int = 2,
    max_block: int | None = None,
) -> DataFrame:
    """Blocked fuzzy matching by edit distance: all (a, b) pairs with
    `a.id < b.id`, the same `block_col`, and
    levenshtein(a.text, b.text) <= max_dist. Complements the gram-
    Jaccard scorer for short strings where a single typo wrecks the
    gram set but edit distance stays small.

    Scale shape: candidates are generated ONLY within a block (the
    caller picks the blocking function; sum b_i^2 is the cost), and a
    length pre-filter |len(a) - len(b)| <= max_dist runs BEFORE the
    levenshtein call — edit distance can never beat the length gap, so
    the expensive expression is evaluated on the surviving fraction
    only. Everything is JVM-side (F.levenshtein is a built-in).

    `max_block`: if set, blocks with more members are DROPPED (not
    sub-salted — sub-salting would silently lose cross-salt pairs and
    edit distance has no multi-band recovery). Dropped volume is the
    same observable-cap philosophy as dedup.lsh_bucket_stats; count it
    with df.groupBy(block_col) before raising the cap.
    """
    cols = df.select(F.col(id_col).alias("_fid"),
                     F.col(text_col).alias("_ftext"),
                     F.col(block_col).alias("_fblk"),
                     F.length(text_col).alias("_flen"))
    if max_block is not None:
        sizes = cols.groupBy("_fblk").agg(F.count(F.lit(1)).alias("_fbn"))
        # Broadcast the few OVERSIZED blocks and anti-join them away —
        # the kept-block table is nearly every block at scale, so
        # broadcasting it inverts the size argument (same fix as
        # dedup.containment_pairs).
        big = sizes.where(F.col("_fbn") > max_block).select("_fblk")
        cols = cols.join(F.broadcast(big), on="_fblk", how="left_anti")
    from mms_rdf_spark.operators.skew import pin_fanout_partitions
    cols = pin_fanout_partitions(cols, "_fblk")  # AQE fan-out blindness
    a = cols.select(F.col("_fblk"), F.col("_fid").alias("id_a"),
                    F.col("_ftext").alias("_ta"),
                    F.col("_flen").alias("_la"))
    b = cols.select(F.col("_fblk"), F.col("_fid").alias("id_b"),
                    F.col("_ftext").alias("_tb"),
                    F.col("_flen").alias("_lb"))
    return (a.join(b, on="_fblk")
            .where((F.col("id_a") < F.col("id_b"))
                   & (F.abs(F.col("_la") - F.col("_lb")) <= max_dist))
            .withColumn("dist", F.levenshtein("_ta", "_tb"))
            .where(F.col("dist") <= max_dist)
            .select("id_a", "id_b", "dist"))


def link_mentions(
    mention_triples: DataFrame,
    jaccard_threshold: float = DEFAULT_JACCARD,
) -> DataFrame:
    """mention triples -> entities(surface, entity_id, canonical_iri):
    the full linking composition (surfaces -> blocking/candidate edges
    -> connected components -> canonical entity table).

    The surface table is localCheckpoint-ed ONCE here: it is consumed
    by both candidate tiers, the CC seed, and entity_table, and without
    the checkpoint each consumer would re-run the upstream extraction
    scan (at 10^12 turns, four full corpus passes instead of one).
    Collapse-then-checkpoint is the canonical shape for every caller —
    pipeline.py stage `link` and the bench both route through here.
    """
    from mms_rdf_spark.operators.cc import connected_components

    surfaces = distinct_surfaces(mention_triples).localCheckpoint()
    comps = connected_components(
        candidate_edges(surfaces, jaccard_threshold), "src", "dst")
    return entity_table(surfaces, comps)


def _blocked_agreement_pairs(
    df: DataFrame,
    id_col: str,
    block_col: str,
    feats: list,
    label_text_col: str,
    max_block: int | None,
) -> DataFrame:
    """Shared pair seam for the Fellegi-Sunter family: blocked
    candidate self-join (id_a < id_b) carrying the label text
    (_ta/_tb) and one boolean agreement column _ag{i} per feature
    (null-safe string equality). Oversized blocks droppable via
    `max_block` (broadcast anti-join of the few HOT blocks); the
    fan-out exchange is pinned against AQE's byte-based coalescing."""
    cols = df.select(
        F.col(id_col).alias("_fid"),
        F.col(label_text_col).alias("_ftext"),
        F.col(block_col).alias("_fblk"),
        *[F.col(c).cast("string").alias(f"_f{i}")
          for i, c in enumerate(feats)])
    if max_block is not None:
        sizes = cols.groupBy("_fblk").agg(
            F.count(F.lit(1)).alias("_fbn"))
        big = sizes.where(F.col("_fbn") > max_block).select("_fblk")
        cols = cols.join(F.broadcast(big), on="_fblk", how="left_anti")
    from mms_rdf_spark.operators.skew import pin_fanout_partitions
    cols = pin_fanout_partitions(cols, "_fblk")
    a = cols.select(
        "_fblk", F.col("_fid").alias("id_a"),
        F.col("_ftext").alias("_ta"),
        *[F.col(f"_f{i}").alias(f"_a{i}") for i in range(len(feats))])
    b = cols.select(
        "_fblk", F.col("_fid").alias("id_b"),
        F.col("_ftext").alias("_tb"),
        *[F.col(f"_f{i}").alias(f"_b{i}") for i in range(len(feats))])
    pairs = (a.join(b, on="_fblk")
             .where(F.col("id_a") < F.col("id_b")))
    for i in range(len(feats)):
        pairs = pairs.withColumn(
            f"_ag{i}",
            F.col(f"_a{i}").eqNullSafe(F.col(f"_b{i}")))
    return pairs


def fellegi_sunter_scores(
    df: DataFrame,
    id_col: str,
    block_col: str,
    feature_cols: list,
    label_text_col: str,
    label_max_dist: int = 2,
    max_block: int | None = None,
    precision: int = 9,
    eager: bool = True,
) -> DataFrame:
    """Fellegi-Sunter probabilistic record linkage over blocked
    candidate pairs: per-feature agreement probabilities m_k =
    P(agree_k | match) and u_k = P(agree_k | non-match) are estimated
    from the candidates themselves (training label = edit distance on
    `label_text_col` <= label_max_dist), then every pair is scored
    with the classic log-likelihood weights — ln(m/u) when feature k
    agrees, ln((1-m)/(1-u)) when it disagrees. Returns
    (id_a, id_b, is_match, score); a high score on a NON-match row is
    exactly the "probable duplicate the fuzzy rule missed" review
    queue, the point of FS over hard thresholds.

    Probability estimates use a +0.5/+1.0 Laplace clamp so zero-count
    cells never produce infinite weights. Determinism: counts are
    exact longs aggregated in ONE pass (2 + 2K cells, broadcast back
    over the pair frame); each weight is a single ln() rounded to
    `precision` dp; the pair score is a FIXED left-to-right chain of
    the (at most K) rounded weights rounded to 6dp — no
    order-dependent float accumulation anywhere, so the DuckDB oracle
    (link_fs_scores) hash-matches.

    Scale shape: same blocked self-join as fuzzy_edit_pairs (sum of
    block-size^2 cost, oversized blocks droppable via `max_block`,
    fan-out exchange pinned against AQE coalescing); the weights
    frame is ONE row; scoring is a broadcast crossJoin + column math.
    Reference parity: the reference links purely by exact key
    (triplifier's element id join) — this is the beyond-reference
    probabilistic upgrade on the same blocking seam.
    """
    feats = list(feature_cols)
    pairs = (_blocked_agreement_pairs(df, id_col, block_col, feats,
                                      label_text_col, max_block)
             .withColumn("is_match",
                         F.levenshtein("_ta", "_tb")
                         <= F.lit(label_max_dist)))
    # the pair frame feeds TWO consumers (the m/u count aggregate and
    # the scoring pass): checkpoint so the blocked join runs once.
    # eager=False keeps the lineage visible for plan assertions.
    if eager:
        pairs = pairs.localCheckpoint()

    m_flag = F.col("is_match").cast("long")
    counts = pairs.agg(
        F.sum(m_flag).alias("_nm"),
        F.sum(1 - m_flag).alias("_nu"),
        *[F.sum(F.col(f"_ag{i}").cast("long") * m_flag)
          .alias(f"_am{i}") for i in range(len(feats))],
        *[F.sum(F.col(f"_ag{i}").cast("long") * (1 - m_flag))
          .alias(f"_au{i}") for i in range(len(feats))])
    scored = pairs.crossJoin(F.broadcast(counts))
    score = None
    for i in range(len(feats)):
        m_k = (F.col(f"_am{i}") + F.lit(0.5)) \
            / (F.col("_nm") + F.lit(1.0))
        u_k = (F.col(f"_au{i}") + F.lit(0.5)) \
            / (F.col("_nu") + F.lit(1.0))
        w_agree = F.round(F.log(m_k / u_k), precision)
        w_dis = F.round(F.log((F.lit(1.0) - m_k)
                              / (F.lit(1.0) - u_k)), precision)
        term = F.when(F.col(f"_ag{i}"), w_agree).otherwise(w_dis)
        score = term if score is None else score + term
    return scored.select("id_a", "id_b", "is_match",
                         F.round(score, 6).alias("score"))


def fellegi_sunter_em(
    df: DataFrame,
    id_col: str,
    block_col: str,
    feature_cols: list,
    label_text_col: str,
    iters: int = 3,
    lam0: float = 0.1,
    m0: float = 0.9,
    u0: float = 0.1,
    max_block: int | None = None,
) -> DataFrame:
    """UNSUPERVISED Fellegi-Sunter parameter estimation (Winkler's EM
    over the latent match indicator): no training label at all — the
    E-step scores every blocked pair with the current (lambda, m_k,
    u_k) under conditional independence, the M-step re-estimates them
    from the posterior weights. Returns the tall parameter table
    (param, value): 'lambda' plus 'm_<col>' / 'u_<col>' per feature
    after `iters` rounds — feed them to any scorer. This is the
    companion to fellegi_sunter_scores (which needs an edit-distance
    pseudo-label); EM is what you run when no label exists, the
    standard production bootstrap for probabilistic linkage.

    Determinism / parity (the logreg recipe): each posterior is a
    fixed left-to-right product chain rounded to 9dp; every M-step
    numerator/denominator is an EXACT 1e9 micro-unit long sum
    (order-independent), each new parameter is ONE long/long double
    division rounded to 9dp and clamped into [1e-6, 1-1e-6]
    engine-side (degenerate cells can't zero a next-round product or
    divide by zero under ANSI) — the DuckDB oracle (link_fs_em)
    unrolls the same rounds as CTEs and hash-matches bit-for-bit.

    Scale shape: one blocked pair materialization (localCheckpoint —
    the E-step re-scans it per round), each round = one broadcast
    crossJoin of the 1-row parameter frame + one map-side-combined
    aggregate producing 1 + 2K longs. Nothing pair-proportional ever
    reaches the driver.
    """
    feats = list(feature_cols)
    k = len(feats)
    pairs = _blocked_agreement_pairs(
        df, id_col, block_col, feats, label_text_col, max_block) \
        .select("id_a", "id_b",
                *[F.col(f"_ag{i}") for i in range(k)]) \
        .localCheckpoint()
    spark = df.sparkSession
    params = spark.createDataFrame(
        [tuple([lam0] + [m0] * k + [u0] * k)],
        ", ".join(["lam double"]
                  + [f"m{i} double" for i in range(k)]
                  + [f"u{i} double" for i in range(k)]))

    def _clamp(c):
        return F.least(F.greatest(c, F.lit(1e-6)),
                       F.lit(1.0) - F.lit(1e-6))

    giga = F.lit(1000000000)
    for _ in range(iters):
        j = pairs.crossJoin(F.broadcast(params))
        num = F.col("lam")
        den1 = F.lit(1.0) - F.col("lam")
        for i in range(k):
            num = num * F.when(F.col(f"_ag{i}"), F.col(f"m{i}")) \
                .otherwise(F.lit(1.0) - F.col(f"m{i}"))
            den1 = den1 * F.when(F.col(f"_ag{i}"), F.col(f"u{i}")) \
                .otherwise(F.lit(1.0) - F.col(f"u{i}"))
        w9 = F.round(num / (num + den1), 9)
        wu = F.round(w9 * 1e9).cast("long")  # exact micro-units
        g = j.select(wu.alias("_wu"),
                     *[F.col(f"_ag{i}").cast("long").alias(f"_g{i}")
                       for i in range(k)]) \
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("_wu").alias("sw"),
                 *[F.sum(F.col(f"_g{i}") * F.col("_wu"))
                   .alias(f"swg{i}") for i in range(k)],
                 *[F.sum(f"_g{i}").alias(f"g{i}") for i in range(k)])
        # every update is ONE division of exact longs, rounded + clamped
        sw_safe = F.greatest(F.col("sw"), F.lit(1))
        nu_safe = F.greatest(F.col("n") * giga - F.col("sw"), F.lit(1))
        params = g.select(
            _clamp(F.round(F.col("sw") / (F.col("n") * giga), 9))
            .alias("lam"),
            *[_clamp(F.round(F.col(f"swg{i}") / sw_safe, 9))
              .alias(f"m{i}") for i in range(k)],
            *[_clamp(F.round(
                (F.col(f"g{i}") * giga - F.col(f"swg{i}")) / nu_safe,
                9)).alias(f"u{i}") for i in range(k)],
        ).localCheckpoint()

    rows = [F.struct(F.lit("lambda").alias("param"),
                     F.col("lam").alias("value"))]
    for i, name in enumerate(feats):
        rows.append(F.struct(F.lit(f"m_{name}").alias("param"),
                             F.col(f"m{i}").alias("value")))
        rows.append(F.struct(F.lit(f"u_{name}").alias("param"),
                             F.col(f"u{i}").alias("value")))
    return (params.select(F.explode(F.array(*rows)).alias("_p"))
            .select("_p.param", "_p.value"))


def _jaro_winkler_py(s1: str, s2: str) -> float:
    """Standard Jaro-Winkler (p=0.1, boost threshold jaro>0.7, prefix
    cap 4, empty string -> 0.0). Bit-for-bit parity with DuckDB's
    jaro_winkler_similarity is fuzz-pinned in tests/test_link_jw.py —
    both reduce to the same double arithmetic, so the contract oracle
    can use the engine builtin directly."""
    l1, l2 = len(s1), len(s2)
    if l1 == 0 or l2 == 0:
        return 0.0
    window = max(l1, l2) // 2 - 1
    if window < 0:
        window = 0
    flags1 = [False] * l1
    flags2 = [False] * l2
    m = 0
    for i, c in enumerate(s1):
        lo = i - window if i > window else 0
        hi = min(l2, i + window + 1)
        for j in range(lo, hi):
            if not flags2[j] and s2[j] == c:
                flags1[i] = flags2[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(l1):
        if flags1[i]:
            while not flags2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    jaro = (m / l1 + m / l2 + (m - t) / m) / 3.0
    if jaro > 0.7:
        p = 0
        for a, b in zip(s1[:4], s2[:4]):
            if a != b:
                break
            p += 1
        jaro += p * 0.1 * (1.0 - jaro)
    return jaro


def jaro_winkler_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_col: str,
    threshold: float = 0.9,
    max_block: int | None = None,
) -> DataFrame:
    """Blocked fuzzy matching by Jaro-Winkler: all (a, b) pairs with
    `a.id < b.id`, the same `block_col`, and JW(a.text, b.text) >=
    threshold (compared on the 6dp-rounded score, so the cut is
    cross-engine stable). Complements fuzzy_edit_pairs for name-like
    strings where prefix agreement matters more than raw edit count
    (the classic record-linkage scorer, Winkler 1990).

    Scale shape: pairs exist only within a block (sum b_i^2);
    oversized blocks are dropped via the same broadcast-the-few-HOT-
    blocks anti-join as fuzzy_edit_pairs; the pair join is pinned
    against AQE fan-out coalescing. Before the Python scorer runs, a
    JVM-side length-ratio prefilter removes pairs that can never reach
    `threshold`: jw <= 0.6*jaro + 0.4 and jaro <= (2 + lmin/lmax)/3,
    so lmin/lmax >= 5*threshold - 4 is NECESSARY — at the default 0.9
    that kills every pair whose lengths differ by more than 2x without
    leaving the JVM. The scorer itself is an Arrow-batched pandas UDF
    (short strings, pure-Python inner loop over each Arrow batch).
    """
    from pyspark.sql.functions import pandas_udf

    from mms_rdf_spark.operators.skew import pin_fanout_partitions

    cols = df.select(F.col(id_col).alias("_jid"),
                     F.col(text_col).alias("_jtext"),
                     F.col(block_col).alias("_jblk"),
                     F.length(text_col).alias("_jlen"))
    if max_block is not None:
        sizes = cols.groupBy("_jblk").agg(F.count(F.lit(1)).alias("_jbn"))
        big = sizes.where(F.col("_jbn") > max_block).select("_jblk")
        cols = cols.join(F.broadcast(big), on="_jblk", how="left_anti")
    cols = pin_fanout_partitions(cols, "_jblk")

    @pandas_udf("double")
    def _jw(a: pd.Series, b: pd.Series) -> pd.Series:
        f = _jaro_winkler_py
        return pd.Series([f(x or "", y or "") for x, y in zip(a, b)],
                         dtype="float64")

    a = cols.select(F.col("_jblk"), F.col("_jid").alias("id_a"),
                    F.col("_jtext").alias("_ta"),
                    F.col("_jlen").alias("_la"))
    b = cols.select(F.col("_jblk"), F.col("_jid").alias("id_b"),
                    F.col("_jtext").alias("_tb"),
                    F.col("_jlen").alias("_lb"))
    # prefilter against the TRUE score, but the final cut is on the
    # 6dp-rounded score — back the bound off by the rounding radius so
    # a pair at threshold-5e-7 (rounds UP to threshold) can't be
    # prefiltered away
    ratio_min = 5.0 * (threshold - 1e-6) - 4.0
    pairs = (a.join(b, on="_jblk")
             .where(F.col("id_a") < F.col("id_b")))
    if ratio_min > 0:
        pairs = pairs.where(
            F.least("_la", "_lb")
            >= ratio_min * F.greatest("_la", "_lb"))
    return (pairs
            .withColumn("jw", F.round(_jw("_ta", "_tb"), 6))
            .where(F.col("jw") >= threshold)
            .select("id_a", "id_b", "jw"))



def _symmetrized_micro(pairs: DataFrame, id_a: str, id_b: str,
                       score_col: str) -> DataFrame:
    """Both orientations of an undirected scored pair set, with the
    score lifted to an exact micro long so every rank/argmax below
    compares integers (floats rounded to 6dp ARE exact at 1e6 scale;
    comparing the longs keeps engines and partitionings agreed)."""
    micro = F.round(F.col(score_col) * 1e6).cast("long")
    fwd = pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"),
                       micro.alias("s"))
    rev = pairs.select(F.col(id_b).alias("u"), F.col(id_a).alias("v"),
                       micro.alias("s"))
    return fwd.unionByName(rev)


def mutual_best_match(pairs: DataFrame, id_a: str = "id_a",
                      id_b: str = "id_b",
                      score_col: str = "score") -> DataFrame:
    """Reciprocal-best-hit one-to-one assignment — the ER step after
    pair scoring (fellegi_sunter_scores / jaro_winkler_pairs emit
    SCORED PAIRS; an entity-resolution decision needs each record
    matched at most once): keep (a, b) iff b is a's highest-scoring
    partner AND a is b's (ties by partner id asc). Returns
    (id_a, id_b, score) with id_a < id_b, each id appearing at most
    once — the "locally dominant" pairs of the matching literature.

    Plan: symmetrize -> one row_number window per node -> self-join
    of the two rank-1 orientations. Two exchanges total, both on node
    id (unskewable uniform keys after blocking caps)."""
    from pyspark.sql.window import Window

    sym = _symmetrized_micro(pairs, id_a, id_b, score_col)
    w = Window.partitionBy("u").orderBy(F.col("s").desc(), "v")
    best = (sym.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1).select("u", "v", "s"))
    other = best.select(F.col("u").alias("_bu"),
                        F.col("v").alias("_bv"))
    return (best.join(other, (F.col("u") == F.col("_bv"))
                      & (F.col("v") == F.col("_bu")))
            .where(F.col("u") < F.col("v"))
            .select(F.col("u").alias(id_a), F.col("v").alias(id_b),
                    F.round(F.col("s") / 1e6, 6).alias(score_col)))


def greedy_matching(pairs: DataFrame, id_a: str = "id_a",
                    id_b: str = "id_b", score_col: str = "score",
                    max_rounds: int = 40) -> DataFrame:
    """Greedy maximum-weight one-to-one matching via repeated
    locally-dominant pair elimination (Preis 1999 / Manne-Bisseling:
    a pair that is mutually each other's best surviving partner is
    ALWAYS in the greedy matching, and all such pairs can be taken
    simultaneously): each round takes every reciprocal-best pair,
    removes both endpoints, repeats until no edges survive. Under the
    total order (score desc, u asc, v asc) the result is EXACTLY the
    sequential sort-all-pairs greedy matching — pinned against a
    pure-Python twin in tests/test_link_matching.py.

    Scale shape per round: one node-keyed window + one broadcast-able
    anti-join of matched nodes; lineage truncated by localCheckpoint
    (the cc/pagerank discipline). Rounds are data-dependent (~log n
    typical; a monotone-decreasing path is the linear worst case) —
    `max_rounds` exhaustion raises LOUDLY rather than returning a
    partial matching."""
    from pyspark.sql.window import Window

    sym = _symmetrized_micro(pairs, id_a, id_b, score_col) \
        .localCheckpoint()
    out = None
    for _ in range(max_rounds):
        if sym.rdd.isEmpty():
            break
        w = Window.partitionBy("u").orderBy(F.col("s").desc(), "v")
        best = (sym.withColumn("_rn", F.row_number().over(w))
                .where(F.col("_rn") == 1).select("u", "v", "s"))
        other = best.select(F.col("u").alias("_bu"),
                            F.col("v").alias("_bv"))
        matched = (best.join(other, (F.col("u") == F.col("_bv"))
                             & (F.col("v") == F.col("_bu")))
                   .where(F.col("u") < F.col("v"))
                   .select("u", "v", "s").localCheckpoint())
        out = matched if out is None else out.unionByName(matched)
        nodes = (matched.select(F.col("u").alias("n"))
                 .unionByName(matched.select(F.col("v").alias("n"))))
        # no broadcast hint: round-1's matched set can approach n/2
        # nodes, so let AQE pick broadcast-vs-shuffle per round
        sym = (sym.join(nodes, F.col("u") == F.col("n"), "left_anti")
               .join(nodes, F.col("v") == F.col("n"), "left_anti")
               .localCheckpoint())
    # re-check AFTER the loop: exhausting range() on the round that
    # cleared the last edge is convergence, not failure
    if not sym.rdd.isEmpty():
        raise RuntimeError(
            f"greedy_matching: not converged in {max_rounds} rounds")
    if out is None:
        return pairs.select(F.col(id_a), F.col(id_b),
                            F.col(score_col)).limit(0)
    return out.select(F.col("u").alias(id_a), F.col("v").alias(id_b),
                      F.round(F.col("s") / 1e6, 6).alias(score_col))


def golden_record(df: DataFrame, cluster_col: str, attr_cols: list,
                  id_col: str = "doc_id") -> DataFrame:
    """Survivorship / golden-record construction — the MDM step after
    clustering: one canonical row per entity cluster, where each
    attribute independently takes the cluster's MODAL value (most
    frequent; ties by value asc — F.mode() is tie-nondeterministic,
    so this uses an explicit count+rank), plus n_members and rep_id
    (min member id) for lineage. NULLs never win: null attribute
    values are excluded from the vote (a cluster that is all-NULL on
    an attribute yields NULL).

    Plan: one (cluster, attr, value) count per attribute + one
    cluster-keyed rank window each — aggregates of aggregates, so the
    shuffled bytes are cluster-cardinality-sized, never corpus-sized;
    the per-attr frames re-join on the cluster key they are already
    partitioned by."""
    from pyspark.sql.window import Window

    base = df.groupBy(F.col(cluster_col).alias("cluster")).agg(
        F.count(F.lit(1)).alias("n_members"),
        F.min(id_col).alias("rep_id"))
    out = base
    for attr in attr_cols:
        counts = (df.where(F.col(attr).isNotNull())
                  .groupBy(F.col(cluster_col).alias("cluster"),
                           F.col(attr))
                  .agg(F.count(F.lit(1)).alias("_c")))
        w = Window.partitionBy("cluster").orderBy(
            F.col("_c").desc(), F.col(attr))
        winner = (counts.withColumn("_rn", F.row_number().over(w))
                  .where(F.col("_rn") == 1)
                  .select("cluster", attr))
        out = out.join(winner, on="cluster", how="left")
    return out
