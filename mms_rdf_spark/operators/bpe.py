"""Byte-pair-encoding merge training as pure DataFrame operations.

The tokenizer-induction step a pretraining pipeline runs after
curation: learn the first R BPE merges from the corpus word-frequency
table. Complements textstats.token_vocab (which ranks whole tokens);
this learns SUBWORD units the way Sennrich-style BPE trainers do —
count adjacent symbol pairs weighted by word frequency, merge the
globally best pair everywhere, repeat.

Design: the corpus collapses to the DISTINCT-WORD frequency table
before any iteration (the classic trick — 10^12 tokens become ~10^6
distinct words), so each round iterates over vocabulary, not corpus.
Words are represented as unit-separator-joined symbol strings; a merge
is then ONE replace(s, a+US+b, a+US? no — a+b) column expression, and
both engines' replace() substitutes non-overlapping occurrences
left-to-right, which IS the canonical greedy BPE merge order (the
"aaa" + (a,a) case yields [aa, a] in both). The winning pair never
leaves the cluster: it is a 1-row DataFrame cross-joined (broadcast)
into the next round's plan — no collect, no driver loop over data.

Scale notes: per round, one explode of vocab into adjacent pairs ->
map-side-combined (a, b) count -> TakeOrdered(1) -> broadcast; the
vocab table localCheckpoints per round (cc.py lineage pattern). R
rounds = R small jobs over |vocab| rows. Hot pairs are absorbed by
partial aggregation; the explode factor is word length, bounded by the
tokenizer's max word size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

US = chr(31)  # unit separator: joins symbols within a word


def _charify(col) -> F.Column:
    """word -> US-joined single characters ("abc" -> "a<US>b<US>c")."""
    tagged = F.regexp_replace(col, "(.)", "$1" + US)
    return F.substring(tagged, 1, F.length(tagged) - 1)


def bpe_merges(
    docs: DataFrame,
    rounds: int = 5,
    text_col: str = "text",
) -> DataFrame:
    """Learn the first `rounds` BPE merges from the corpus. Returns
    (round, a, b, cnt): at each round the adjacent symbol pair with the
    highest frequency-weighted count (ties -> lexicographic (a, b)),
    merged into one symbol everywhere before the next round.

    Determinism: counts are exact integers and the tiebreak is total,
    so a SQL oracle unrolling the same rounds hash-matches.
    """
    if not 1 <= rounds <= 16:
        raise ValueError("bpe_merges: 1..16 rounds supported")
    toks = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    words = (docs.select(F.explode(toks).alias("w"))
             .groupBy("w").agg(F.count(F.lit(1)).alias("freq"))
             .select(_charify(F.col("w")).alias("s"), "freq")
             .localCheckpoint())
    tops = []
    for r in range(1, rounds + 1):
        pairs = words.select(
            F.explode(F.expr(
                f"transform(slice(split(s, '{US}'), 1, "
                f"size(split(s, '{US}')) - 1), "
                f"(x, i) -> struct(x as a, "
                f"element_at(split(s, '{US}'), i + 2) as b))"))
            .alias("p"), "freq")
        top = (pairs.groupBy(F.col("p.a").alias("a"),
                             F.col("p.b").alias("b"))
               .agg(F.sum("freq").alias("cnt"))
               .orderBy(F.col("cnt").desc(), "a", "b").limit(1)
               .select(F.lit(r).alias("round"), "a", "b", "cnt")
               .localCheckpoint())
        tops.append(top)
        words = (words.crossJoin(F.broadcast(top))
                 .select(F.replace(
                     F.col("s"),
                     F.concat(F.col("a"), F.lit(US), F.col("b")),
                     F.concat(F.col("a"), F.col("b"))).alias("s"),
                     "freq")
                 .localCheckpoint())
    out = tops[0]
    for t in tops[1:]:
        out = out.unionByName(t)
    return out


def bpe_segment(
    docs: DataFrame,
    merges: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Apply a learned merge table: tokenize each doc's words with the
    merges in training order, returning (id, n_words, n_subwords) —
    the compression diagnostic tokenizer training reports.

    The merge table is collected to build the replace chain (it is the
    MODEL — R rows by construction, not data-sized), then applied as R
    stacked column expressions over the corpus: one scan, no joins.
    """
    rows = merges.orderBy("round").collect()
    s = _charify(F.col("_w"))
    for m in rows:
        s = F.replace(s, F.lit(m["a"] + US + m["b"]),
                      F.lit(m["a"] + m["b"]))
    toks = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    per_word = (docs.select(F.col(id_col), F.explode(toks).alias("_w"))
                .select(id_col,
                        F.size(F.split(s, US)).alias("_ns")))
    return (per_word.groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_words"),
                 F.sum("_ns").alias("n_subwords")))


def wordpiece_merges(
    docs: DataFrame,
    rounds: int = 4,
    text_col: str = "text",
) -> DataFrame:
    """WordPiece-objective merge training (Schuster & Nakajima 2012 /
    the BERT tokenizer): identical mechanics to bpe_merges, but each
    round merges the pair maximizing the LIKELIHOOD score
    count(ab) / (count(a) * count(b)) instead of raw frequency —
    preferring pairs that co-occur far above chance even when rare.

    Determinism: the score is gridded once as an integer key
    round(cnt * 1e18 / (n_a * n_b)) — the double expression is
    fixed-order and identical on both engines, ties break on the
    exact key then (a, b) — so the SQL oracle unrolling the same
    rounds hash-matches. Returns (round, a, b, cnt, score) with
    score = key / 1e18 rounded 6.

    Scale shape: per round, one symbol-count aggregate + one pair
    aggregate over the DISTINCT-WORD table, two symbol joins on the
    pair table, TakeOrdered(1), broadcast back — bpe_merges'
    vocabulary-not-corpus discipline throughout.
    """
    if not 1 <= rounds <= 16:
        raise ValueError("wordpiece_merges: 1..16 rounds supported")
    toks = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    words = (docs.select(F.explode(toks).alias("w"))
             .groupBy("w").agg(F.count(F.lit(1)).alias("freq"))
             .select(_charify(F.col("w")).alias("s"), "freq")
             .localCheckpoint())
    tops = []
    for r in range(1, rounds + 1):
        syms = (words.select(
            F.explode(F.split("s", US)).alias("sym"), "freq")
            .groupBy("sym")
            .agg(F.sum("freq").cast("long").alias("n")))
        pairs = words.select(
            F.explode(F.expr(
                f"transform(slice(split(s, '{US}'), 1, "
                f"size(split(s, '{US}')) - 1), "
                f"(x, i) -> struct(x as a, "
                f"element_at(split(s, '{US}'), i + 2) as b))"))
            .alias("p"), "freq")
        pc = (pairs.groupBy(F.col("p.a").alias("a"),
                            F.col("p.b").alias("b"))
              .agg(F.sum("freq").cast("long").alias("cnt")))
        jn = (pc.join(syms.withColumnRenamed("sym", "a")
                      .withColumnRenamed("n", "_na"), on="a")
              .join(syms.withColumnRenamed("sym", "b")
                    .withColumnRenamed("n", "_nb"), on="b"))
        key = F.round(F.col("cnt").cast("double") * 1e18
                      / (F.col("_na").cast("double")
                         * F.col("_nb").cast("double"))).cast("long")
        top = (jn.withColumn("_key", key)
               .orderBy(F.col("_key").desc(), "a", "b").limit(1)
               .select(F.lit(r).cast("int").alias("round"),
                       "a", "b", "cnt",
                       F.round(F.col("_key") / 1e18, 6)
                       .alias("score"))
               .localCheckpoint())
        tops.append(top)
        words = (words.crossJoin(F.broadcast(top))
                 .select(F.replace(
                     F.col("s"),
                     F.concat(F.col("a"), F.lit(US), F.col("b")),
                     F.concat(F.col("a"), F.col("b"))).alias("s"),
                     "freq")
                 .localCheckpoint())
    out = tops[0]
    for t in tops[1:]:
        out = out.unionByName(t)
    return out
