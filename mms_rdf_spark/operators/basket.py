"""Market-basket co-occurrence mining ("customers also bought").

The recommendation-prep operator family: from (basket, item) facts,
compute item-item co-occurrence counts and the cosine association
score n_ab / sqrt(n_a * n_b). The reference has no analog (it is a
converter); this serves the same downstream KG role as link.py's
similarity edges — association edges between catalog entities.

Scale shape: the pair generation is a self-join WITHIN a basket, so
cost is sum(basket_size^2) — bounded by `max_basket`, which DROPS
oversized baskets outright (observable cap, same philosophy as
link.fuzzy_edit_pairs: a 10^6-item basket is bot traffic, and
sub-salting would silently lose cross-salt pairs). Item totals are a
tiny aggregate broadcast back over the pair counts; the fact table
shuffles once on the basket key, pairs once on (item_a, item_b) with
map-side combine absorbing hot pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cooccurrence_similarity(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    max_basket: int | None = None,
    min_pairs: int = 1,
    ndigits: int = 6,
) -> DataFrame:
    """(item_a, item_b, n_ab, cosine) for item pairs sharing at least
    `min_pairs` baskets, item_a < item_b. Multiplicity within a basket
    is ignored (distinct items per basket first — the standard
    association-mining contract). cosine = n_ab / sqrt(n_a * n_b)
    where n_x is the item's basket count; exact integer counts into
    one sqrt, so the score is cross-engine deterministic at `ndigits`.
    """
    bi = (df.select(F.col(basket_col).alias("_bk"),
                    F.col(item_col).alias("_it"))
          .distinct())
    if max_basket is not None:
        sizes = bi.groupBy("_bk").agg(F.count(F.lit(1)).alias("_bn"))
        bi = (bi.join(F.broadcast(sizes.where(F.col("_bn") <= max_basket)),
                      on="_bk").drop("_bn"))
    bi = bi.localCheckpoint()  # reused by pairs AND totals
    from mms_rdf_spark.operators.skew import pin_fanout_partitions
    bp = pin_fanout_partitions(bi, "_bk")  # AQE fan-out blindness
    a = bp.select("_bk", F.col("_it").alias("item_a"))
    b = bp.select("_bk", F.col("_it").alias("item_b"))
    pairs = (a.join(b, on="_bk")
             .where(F.col("item_a") < F.col("item_b"))
             .groupBy("item_a", "item_b")
             .agg(F.count(F.lit(1)).alias("n_ab"))
             .where(F.col("n_ab") >= min_pairs))
    totals = bi.groupBy("_it").agg(F.count(F.lit(1)).alias("_nx"))
    return (pairs
            .join(F.broadcast(totals.select(
                F.col("_it").alias("item_a"),
                F.col("_nx").alias("_na"))), on="item_a")
            .join(F.broadcast(totals.select(
                F.col("_it").alias("item_b"),
                F.col("_nx").alias("_nb"))), on="item_b")
            .select("item_a", "item_b", "n_ab",
                    F.round(F.col("n_ab")
                            / F.sqrt(F.col("_na") * F.col("_nb")),
                            ndigits).alias("cosine")))


def association_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_pairs: int = 2,
    max_basket: int | None = None,
    ndigits: int = 6,
) -> DataFrame:
    """Pairwise association rules (Apriori's 2-itemset stage, the part
    that survives at scale): for each directed rule a -> b,
    support = n_ab/N, confidence = n_ab/n_a, and
    lift = N·n_ab/(n_a·n_b) (>1 = genuinely associated, not just
    popular). Returns (antecedent, consequent, n_ab, support,
    confidence, lift) — both directions of every co-occurring pair.

    Reuses cooccurrence_similarity's capped pair generation; all
    counts exact longs, each metric one float expression. The basket
    total N is a broadcast 1-row frame.
    """
    bi = (df.select(F.col(basket_col).alias("_bk"),
                    F.col(item_col).alias("_it"))
          .distinct())
    if max_basket is not None:
        sizes = bi.groupBy("_bk").agg(F.count(F.lit(1)).alias("_bn"))
        bi = (bi.join(F.broadcast(sizes.where(
            F.col("_bn") <= max_basket)), on="_bk").drop("_bn"))
    bi = bi.localCheckpoint()
    nb = bi.select("_bk").distinct().agg(
        F.count(F.lit(1)).alias("_nb"))
    from mms_rdf_spark.operators.skew import pin_fanout_partitions
    bp = pin_fanout_partitions(bi, "_bk")  # AQE fan-out blindness
    a = bp.select("_bk", F.col("_it").alias("x"))
    b = bp.select("_bk", F.col("_it").alias("y"))
    pairs = (a.join(b, on="_bk")
             .where(F.col("x") < F.col("y"))
             .groupBy("x", "y")
             .agg(F.count(F.lit(1)).alias("n_ab"))
             .where(F.col("n_ab") >= min_pairs))
    both = pairs.unionByName(
        pairs.select(F.col("y").alias("x"), F.col("x").alias("y"),
                     "n_ab"))
    totals = bi.groupBy(F.col("_it")).agg(
        F.count(F.lit(1)).alias("_nx"))
    return (both
            .join(F.broadcast(totals.select(
                F.col("_it").alias("x"), F.col("_nx").alias("_na"))),
                on="x")
            .join(F.broadcast(totals.select(
                F.col("_it").alias("y"), F.col("_nx").alias("_nc"))),
                on="y")
            .crossJoin(F.broadcast(nb))
            .select(F.col("x").alias("antecedent"),
                    F.col("y").alias("consequent"), "n_ab",
                    F.round(F.col("n_ab") / F.col("_nb"), ndigits)
                    .alias("support"),
                    F.round(F.col("n_ab") / F.col("_na"), ndigits)
                    .alias("confidence"),
                    F.round((F.col("_nb") * F.col("n_ab"))
                            / (F.col("_na") * F.col("_nc")), ndigits)
                    .alias("lift")))
