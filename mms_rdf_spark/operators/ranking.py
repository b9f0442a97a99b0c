"""Pairwise-preference ranking: head-to-head games + Bradley-Terry.

An RLHF / eval pipeline aggregates many pairwise preference judgments
("output A beat output B") into per-player strength scores. This module
provides the two halves as DataFrame ops:

  - `pairwise_games`: a deterministic head-to-head schedule between
    document sources — within each (lang, source) docs are ranked, and
    same-rank docs of different sources play a match decided by an
    exact integer criterion (n_chars; ties are discarded). The corpus
    collapses to a (winner, loser, n) table in one pass.
  - `bradley_terry`: Hunter's (2004) MM iteration
        p_i <- W_i / sum_j n_ij / (p_i + p_j),  renormalized
    over the (few) players, with every cross-engine-visible value kept
    on an exact long grid (micro-unit sums) so the DuckDB oracle can
    unroll the SAME iterations as CTEs and hash-match — the pagerank
    iteration-parity recipe (operators/pagerank.py).

Scale shape (100-TB contract): the corpus is scanned ONCE in
`pairwise_games`; the rank join shuffles on (lang, rank) and its width
is |corpus| x |sources-per-rank| (sources/domains are a small, bounded
set). Everything downstream operates on the players^2 pair table —
kilobytes — iterated with localCheckpoint per round and NO .collect():
scalar totals ride a broadcast 1-row frame (the cc.py rule).

Determinism recipes (NOTES.md): per-term micro-unit longs (1e12) make
the per-player denominator sum order-independent; per-player raw
strengths are re-gridded at 1e9 before the normalization sum; the final
score is ONE division of exact-long-derived doubles, rounded 9dp.

The reference has no ranking ops (Node stream-plumbing triple factory);
this is part of the beyond-reference LLM-pipeline suite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pairwise_games(docs: DataFrame) -> DataFrame:
    """documents -> (winner, loser, n) head-to-head win counts between
    sources. Within each (lang, source), docs are ranked by
    (n_chars desc, doc_id); docs holding the same (lang, rank) slot in
    two different sources play one match, won by the larger n_chars
    (exact integer compare; ties discarded so every game has a winner).
    """
    w = Window.partitionBy("lang", "source").orderBy(
        F.desc("n_chars"), "doc_id")
    ranked = docs.select(
        "lang", "source", "n_chars",
        F.row_number().over(w).alias("rk"))
    a, b = ranked.alias("a"), ranked.alias("b")
    games = (
        a.join(b, (F.col("a.lang") == F.col("b.lang"))
               & (F.col("a.rk") == F.col("b.rk"))
               & (F.col("a.source") < F.col("b.source")))
        .where(F.col("a.n_chars") != F.col("b.n_chars"))
        .select(
            F.when(F.col("a.n_chars") > F.col("b.n_chars"),
                   F.col("a.source")).otherwise(F.col("b.source"))
            .alias("winner"),
            F.when(F.col("a.n_chars") > F.col("b.n_chars"),
                   F.col("b.source")).otherwise(F.col("a.source"))
            .alias("loser"))
    )
    return games.groupBy("winner", "loser") \
        .agg(F.count(F.lit(1)).cast("long").alias("n"))


def _round_half_up(x: float, unit: float) -> int:
    """Positive-domain HALF_UP grid (mirror of Spark F.round / DuckDB
    round for the values this module produces)."""
    import math

    return int(math.floor(x * unit + 0.5))


def bradley_terry(games: DataFrame, iterations: int = 8,
                  fold: str = "driver") -> DataFrame:
    """(winner, loser, n) win counts -> (player, score, wins, games)
    Bradley-Terry strengths after `iterations` MM rounds, scores
    normalized to mean 1.0 and rounded to 9dp per round.

    fold="driver" (default): the corpus collapses to the players^2
    pair table in ONE distributed pass, then the MM rounds run
    driver-side on those kilobytes with the SAME micro-unit grid
    arithmetic — the bm25 idf / ivf static-fold precedent (players are
    domains/models: a bounded small set by construction; the ONE
    collect is of the pair table, never in a loop). fold="frames"
    keeps every round distributed (localCheckpoint per round) for
    player sets too large to fold; both paths are row-identical
    (pinned) and hash-match the unrolled SQL oracle.

    Zero-win players converge to score 0 in one round (documented MM
    behavior); the pair table keeps them joined so their opponents'
    denominators stay correct.
    """
    # the games table is players^2-bounded (kilobytes) but its lineage
    # is the full corpus pass — checkpoint once so nn AND the win
    # totals don't each re-run the upstream window + self-join
    games = games.localCheckpoint()
    # symmetric pair table n_ij (+ per-player totals), computed once
    fwd = games.select(F.col("winner").alias("i"),
                       F.col("loser").alias("j"), "n")
    rev = games.select(F.col("loser").alias("i"),
                       F.col("winner").alias("j"), "n")
    nn = fwd.unionByName(rev).groupBy("i", "j") \
        .agg(F.sum("n").alias("n")).localCheckpoint()
    players = nn.select(F.col("i").alias("player")).distinct()
    wins = games.groupBy(F.col("winner").alias("player")) \
        .agg(F.sum("n").alias("w"))
    wtot = players.join(wins, "player", "left") \
        .select("player", F.coalesce("w", F.lit(0)).cast("long").alias("w")) \
        .localCheckpoint()
    n_games = nn.groupBy(F.col("i").alias("player")) \
        .agg((F.sum("n")).cast("long").alias("games"))

    if fold == "driver":
        pair_rows = [(r["i"], r["j"], int(r["n"])) for r in nn.collect()]
        w_by = {r["player"]: int(r["w"]) for r in wtot.collect()}
        g_by: dict[str, int] = {}
        for i, _j, n in pair_rows:
            g_by[i] = g_by.get(i, 0) + n
        p_by = {pl: 1.0 for pl in w_by}
        for _ in range(iterations):
            denom_u = {pl: 0 for pl in p_by}
            for i, j, n in pair_rows:
                denom_u[i] += _round_half_up(
                    n / max(p_by[i] + p_by[j], 1e-12), 1e12)
            pu = {pl: _round_half_up(
                w_by[pl] / (denom_u[pl] / 1e12), 1e9) if denom_u[pl]
                else 0 for pl in p_by}
            su, k = sum(pu.values()), len(pu)
            p_by = {pl: _round_half_up(pu[pl] * k / su, 1e9) / 1e9
                    for pl in p_by}
        rows = [(pl, p_by[pl], w_by[pl], g_by[pl]) for pl in sorted(p_by)]
        return games.sparkSession.createDataFrame(
            rows, "player string, score double, wins long, games long")

    p = players.select("player", F.lit(1.0).alias("p"))
    for _ in range(iterations):
        joined = (
            nn.join(p.select(F.col("player").alias("i"),
                             F.col("p").alias("pi")), "i")
            .join(p.select(F.col("player").alias("j"),
                           F.col("p").alias("pj")), "j")
        )
        # per-term micro-units (1e12): the per-player sum is an exact
        # long, so summation order can never flip a rounded digit
        term_u = F.round(F.col("n") / F.greatest(
            F.col("pi") + F.col("pj"), F.lit(1e-12)) * 1e12).cast("long")
        denom = joined.groupBy("i").agg(F.sum(term_u).alias("du"))
        praw = (
            wtot.join(denom, wtot.player == denom.i)
            .select("player",
                    F.round((F.col("w") / (F.col("du") / F.lit(1e12)))
                            * 1e9).cast("long").alias("pu"))
        )
        tot = praw.agg(F.sum("pu").alias("su"),
                       F.count(F.lit(1)).alias("k"))
        p = (
            praw.crossJoin(F.broadcast(tot))
            .select("player",
                    F.round((F.col("pu") * F.col("k")).cast("double")
                            / F.col("su").cast("double"), 9).alias("p"))
            .localCheckpoint()
        )
    return (
        p.join(wtot, "player").join(n_games, "player")
        .select("player", F.col("p").alias("score"), F.col("w").alias("wins"),
                "games")
    )
