"""Text analysis operators for training-data curation (`documents`).

All built-in column expressions (JVM, codegen'd); all deterministic and
re-computable by the DuckDB oracle. At 100 TB each of these is a
narrow map-only pass — no shuffle at all — which is exactly why they
belong in the scan stage of a curation pipeline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# small English stopword list (fixed: part of the operator contract)
STOPWORDS = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it"]

# BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation
BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


# ---- column-expression builders -------------------------------------
# Each signal is exposed as a pure Column over `text` so COMPOSITE
# recipes (operators/curate.py) can stamp every signal in ONE
# projection of one scan instead of re-joining per-signal DataFrames on
# doc_id. The DataFrame operators below are thin projections of these —
# one definition per signal, so the fused and standalone forms (and
# their SQL oracles) can never drift.

def _text_col(text) -> Column:
    return F.col("text") if text is None else text


def _toks(text) -> Column:
    return F.filter(F.split(text, " "), lambda t: t != "")


def stop_ratio_expr(text=None) -> Column:
    """round(stopword-token ratio, 6) — the shared fluency signal."""
    text = _text_col(text)
    toks = _toks(text)
    n = F.greatest(F.size(toks), F.lit(1))
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    return F.round(
        F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t))) / n, 6)


# translate()-based char-class counters, value-identical to the regex
# forms they replaced (regex [^A-Za-z0-9\s] / [A-Z]; Java \s is exactly
# " \t\n\x0b\f\r"). Swapped because regexp_count's marginal thread
# efficiency measured ~0.42 on this JVM while translate's char-map scan
# stays ~0.9 — the curation signal stage is the flagship one-scan
# recipe, and a 2x multicore regression there is real money at 100 TB.
_UPPER_CHARS = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_ALNUM_WS_CHARS = ("abcdefghijklmnopqrstuvwxyz" + _UPPER_CHARS
                   + "0123456789" + " \t\n\x0b\f\r")


def punct_count_expr(text) -> Column:
    """Chars matching [^A-Za-z0-9\\s] — counted by deleting the
    65-char alnum+whitespace set and measuring what's left."""
    return F.length(F.translate(text, _ALNUM_WS_CHARS, ""))


def upper_count_expr(text) -> Column:
    """Chars matching [A-Z]."""
    return F.length(text) - F.length(F.translate(text, _UPPER_CHARS, ""))


def quality_score_expr(text=None) -> Column:
    """round(stopword_ratio - punct_ratio - upper_ratio, 6)."""
    text = _text_col(text)
    toks = _toks(text)
    n = F.greatest(F.size(toks), F.lit(1))
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    stop_cnt = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    punct = punct_count_expr(text)
    upper = upper_count_expr(text)
    chars = F.greatest(F.length(text), F.lit(1))
    return F.round(stop_cnt / n - punct / chars - upper / chars, 6)


def lang_pred_expr(text=None, threshold: float = 0.08) -> Column:
    """'en' iff the ROUNDED stopword ratio clears `threshold` (the
    comparison is on the rounded value so fused/standalone/SQL agree)."""
    ratio = stop_ratio_expr(text)
    return F.when(ratio >= threshold, F.lit("en")).otherwise(F.lit("other"))


def dup_ratio_expr(text=None, n: int = 2) -> Column:
    """round(1 - distinct/total word n-grams, 6) — the Gopher-style
    within-document repetition signal."""
    from mms_rdf_spark.operators.dedup import _tokens, word_ngrams

    text = _text_col(text)
    grams = word_ngrams(_tokens(text), n)
    return F.round(
        1 - F.size(F.array_distinct(grams)) / F.greatest(F.size(grams),
                                                         F.lit(1)), 6)


def token_stats(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, n_bpe_tokens, mean_token_len)."""
    toks = F.filter(F.split("text", " "), lambda t: t != "")
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.regexp_count("text", F.lit(BPE_RE)).alias("n_bpe_tokens"),
        F.round(
            F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
            / F.greatest(F.size(toks), F.lit(1)), 6).alias("mean_token_len"),
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """Heuristic quality signals + composite score:
    stopword_ratio (fluency proxy), punct_ratio (noise proxy),
    upper_ratio (shouting proxy). score = stopword_ratio
    - punct_ratio - upper_ratio, rounded; deterministic arithmetic."""
    punct = punct_count_expr(F.col("text"))
    upper = upper_count_expr(F.col("text"))
    chars = F.greatest(F.length("text"), F.lit(1))
    return docs.select(
        "doc_id",
        stop_ratio_expr().alias("stopword_ratio"),
        F.round(punct / chars, 6).alias("punct_ratio"),
        F.round(upper / chars, 6).alias("upper_ratio"),
        quality_score_expr().alias("score"),
    )


def detect_language(docs: DataFrame, threshold: float = 0.08) -> DataFrame:
    """N-gram-free language-ID heuristic: English-stopword token ratio;
    >= threshold => 'en' else 'other'. (doc_id, stop_ratio, lang_pred).
    A real model slots in behind the same signature as a pandas UDF."""
    return docs.select(
        "doc_id", stop_ratio_expr().alias("stop_ratio"),
        lang_pred_expr(threshold=threshold).alias("lang_pred"),
    )


# stopword profiles for the multi-language classifier: tiny,
# high-frequency function words per language (the classic cheap
# language-ID signal; a real model slots in as a pandas UDF behind the
# same output schema)
LANG_STOPWORDS = {
    "en": ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu",
           "mit", "ich"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "des", "que",
           "je"],
    "es": ["el", "la", "los", "las", "y", "es", "un", "una", "que",
           "de"],
}


def detect_language_multi(docs: DataFrame,
                          threshold: float = 0.08) -> DataFrame:
    """Multi-language stopword-ratio classifier: per-language function-
    word ratios, argmax wins if it clears `threshold`, else 'other'.
    (doc_id, ratio_<lang>..., lang_pred). Pure column expressions —
    one scan, no shuffle; ties break alphabetically (deterministic
    cross-engine)."""
    toks = F.filter(F.split("text", " "), lambda t: t != "")
    n = F.greatest(F.size(toks), F.lit(1))
    ratios = {}
    for lang, words in sorted(LANG_STOPWORDS.items()):
        arr = F.array(*[F.lit(w) for w in words])
        ratios[lang] = F.round(
            F.size(F.filter(toks, lambda t: F.array_contains(arr, t))) / n, 6)
    best = None
    for lang in sorted(LANG_STOPWORDS):  # alphabetical tie-break
        cond = (ratios[lang] >= threshold)
        for other in sorted(LANG_STOPWORDS):
            if other == lang:
                continue
            op = (ratios[lang] >= ratios[other]) if other > lang \
                else (ratios[lang] > ratios[other])
            cond = cond & op
        best = F.when(cond, F.lit(lang)) if best is None \
            else best.when(cond, F.lit(lang))
    pred = best.otherwise(F.lit("other"))
    return docs.select(
        "doc_id",
        *[ratios[lang].alias(f"ratio_{lang}")
          for lang in sorted(LANG_STOPWORDS)],
        pred.alias("lang_pred"))


def repetition_stats(docs: DataFrame, n: int = 2,
                     dup_threshold: float = 0.3) -> DataFrame:
    """Within-document repetition signal (the Gopher/MassiveText-style
    quality rule: documents whose n-grams repeat heavily are boiler-
    plate/spam): (doc_id, n_grams, n_distinct, dup_ratio, repetitive).
    dup_ratio = 1 - distinct/total word n-grams; `repetitive` flags
    docs over `dup_threshold`. Pure column expressions, no shuffle."""
    from mms_rdf_spark.operators.dedup import _tokens, word_ngrams

    toks = _tokens(F.col("text"))
    grams = word_ngrams(toks, n)
    total = F.size(grams)
    distinct = F.size(F.array_distinct(grams))
    ratio = dup_ratio_expr(n=n)
    return docs.select(
        "doc_id", total.alias("n_grams"), distinct.alias("n_distinct"),
        ratio.alias("dup_ratio"),
        (ratio > dup_threshold).alias("repetitive"))


# PII patterns shared verbatim with the SQL oracle (anchoredness and
# char classes behave identically in JVM regex and DuckDB RE2; the
# email/url patterns reuse the mention-detection definitions,
# functions/iri.py, so detect and redact can never disagree)
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._-]+@[A-Za-z0-9-]+\.[a-z]{2,6}", "[EMAIL]"),
    ("url", r"https?://[A-Za-z0-9./_-]+", "[URL]"),
    ("phone", r"\+?[0-9]{1,3}[-. ]?\(?[0-9]{3}\)?[-. ][0-9]{3}[-. ][0-9]{4}",
     "[PHONE]"),
    ("ssn", r"[0-9]{3}-[0-9]{2}-[0-9]{4}", "[SSN]"),
]


def redact_pii(docs: DataFrame) -> DataFrame:
    """(doc_id, redacted, n_redactions): PII spans replaced by typed
    placeholders — emails, URLs, phone numbers, SSN-shaped ids. The
    standard pre-training scrub; order matters (URL before bare-word
    passes would, e.g., leave mailto fragments) and is fixed by
    PII_PATTERNS. Pure single-scan column expressions; n_redactions
    counts replaced spans so the scrub rate is monitorable."""
    redacted = F.col("text")
    n = F.lit(0)
    for _name, pattern, token in PII_PATTERNS:
        n = n + F.size(F.regexp_extract_all(redacted, F.lit(pattern),
                                            F.lit(0)))
        redacted = F.regexp_replace(redacted, pattern, token)
    return docs.select("doc_id", redacted.alias("redacted"),
                       n.cast("int").alias("n_redactions"))


def fingerprint(docs: DataFrame) -> DataFrame:
    """Document fingerprint: md5 over the whitespace-normalized,
    lowercased text (rolling-hash stand-in, portable across engines).
    (doc_id, fp)."""
    norm = F.lower(F.regexp_replace(F.col("text"), r"\s+", " "))
    return docs.select("doc_id", F.md5(norm).alias("fp"))


def bm25_topk(docs: DataFrame, terms: list[str], k: int = 10,
              k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """BM25 keyword ranking: top-k documents for a fixed term list.
    (doc_id, score), score rounded to 4, ties broken by doc_id.

    Plan shape for 100 TB: for a handful of query terms there is no
    inverted index to shuffle — per-term tf is a pure column expression
    over the token array, so pass 1 is ONE map-side-combined aggregate
    producing a single driver row (N, avgdl, df per term), and pass 2
    folds the idf constants (computed driver-side, rounded to 6 so the
    SQL oracle's ln() agrees) into a second scan's projection followed
    by a TakeOrderedAndProject top-k. Two scans, zero joins, zero wide
    shuffles — the J1 static-fold pattern applied to retrieval.
    """
    import math

    toks = F.filter(F.split("text", " "), lambda t: t != "")
    tf_cols = {t: F.size(F.filter(toks, lambda x: x == F.lit(t)))
               for t in terms}
    per_doc = docs.select(
        "doc_id", F.size(toks).alias("dl"),
        *[tf_cols[t].alias(f"tf_{i}") for i, t in enumerate(terms)])
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("dl"), 6).alias("avgdl"),
        *[F.sum((F.col(f"tf_{i}") > 0).cast("int")).alias(f"df_{i}")
          for i in range(len(terms))]).collect()[0]
    n, avgdl = stats["n"], stats["avgdl"]
    if not n:  # empty corpus: aggregates are NULL, nothing to rank
        return per_doc.select("doc_id",
                              F.lit(None).cast("double").alias("score"))
    idf = [round(math.log(1 + (n - stats[f"df_{i}"] + 0.5)
                          / (stats[f"df_{i}"] + 0.5)), 6)
           for i in range(len(terms))]
    norm = F.col("dl") / avgdl
    score = None
    for i in range(len(terms)):
        tf = F.col(f"tf_{i}").cast("double")
        part = F.lit(idf[i]) * (tf * (k1 + 1)) \
            / (tf + k1 * (1 - b + b * norm))
        score = part if score is None else score + part
    any_hit = None
    for i in range(len(terms)):
        hit = F.col(f"tf_{i}") > 0
        any_hit = hit if any_hit is None else any_hit | hit
    return (per_doc.where(any_hit)
            .select("doc_id", F.round(score, 4).alias("score"))
            .orderBy(F.col("score").desc(), "doc_id").limit(k))


def hard_negatives(
    docs: DataFrame,
    embeddings: DataFrame,
    terms: list[str],
    query_id: int = 0,
    k_lex: int = 20,
    k_pos: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Hard-negative mining for retrieval/embedding training: documents
    that score HIGH on the lexical query (BM25 top-`k_lex`) but are NOT
    among the query document's `k_pos` semantic nearest neighbors —
    lexically-plausible, semantically-far candidates, the negatives
    contrastive training actually needs (BM25-negatives recipe, e.g.
    DPR/RocketQA lineage). Returns (rank, doc_id, bm25, cos), ranked by
    BM25 desc with id tiebreaks; the query doc itself is excluded.

    Scale shape: BM25 is the existing two-scan zero-join fold; the
    semantic side is ONE broadcast-query scan of the embedding table
    (cos per vector, TakeOrdered for the positives); the lexical
    candidate set (k rows) broadcasts into that scored scan and the
    positive set anti-joins as another broadcast. No corpus-x-corpus
    joins anywhere. doc_id == vec_id by corpus convention."""
    from pyspark.sql.window import Window

    from mms_rdf_spark.operators.similarity import (_as_double, _dot,
                                                    _norm)

    lex = bm25_topk(docs, terms, k=k_lex, k1=k1, b=b)
    e = embeddings.select(
        "vec_id", _as_double(F.col("embedding")).alias("emb"))
    qv = e.where(F.col("vec_id") == query_id) \
        .select(F.col("emb").alias("q_emb"))
    scored = (e.crossJoin(F.broadcast(qv))
              .where(F.col("vec_id") != query_id)
              .select("vec_id",
                      F.round(_dot(F.col("emb"), F.col("q_emb"))
                              / (_norm(F.col("emb"))
                                 * _norm(F.col("q_emb"))), 6)
                      .alias("cos")))
    pos = scored.orderBy(F.col("cos").desc(), "vec_id").limit(k_pos)
    cand = (scored
            .join(F.broadcast(lex.where(F.col("doc_id") != query_id)),
                  on=scored["vec_id"] == lex["doc_id"])
            .join(F.broadcast(pos.select("vec_id")), on="vec_id",
                  how="left_anti")
            .select("doc_id", F.col("score").alias("bm25"), "cos"))
    win = Window.orderBy(F.col("bm25").desc(), "doc_id")
    return (cand.orderBy(F.col("bm25").desc(), "doc_id")
            .withColumn("rank", F.row_number().over(win).cast("int"))
            .select("rank", "doc_id", "bm25", "cos"))


def cross_doc_gram_stats(docs: DataFrame, n: int = 5) -> DataFrame:
    """Cross-document duplicated-n-gram statistics: for each doc, how
    much of it is text that also appears verbatim elsewhere in the
    corpus — the n-gram-granular form of substring-level exact dedup
    (the "Deduplicating Training Data" signal, computed corpus-wide).
    (doc_id, n_grams, n_shared, shared_frac): distinct word-5-gram
    digests per doc, how many occur in >=2 docs, and their fraction.

    Scale shape: docs ship 32-char gram DIGESTS (never text) keyed by
    gram — one gram-keyed aggregate for document frequency, the join
    back reuses the same hash partitioning, then a doc_id aggregate.
    Gram df is naturally heavy-tailed but the df aggregate is map-side
    combinable, so hot grams cost partial rows, not a hot task. Shares
    token + gram + digest definitions with decontaminate/repetition
    (dedup.word_ngrams), so the signals can never drift."""
    from mms_rdf_spark.operators.dedup import _tokens, word_ngrams

    g = docs.select(
        "doc_id",
        F.explode(F.array_distinct(
            F.transform(word_ngrams(_tokens(F.col("text")), n), F.md5)
        )).alias("gram"))
    df_w = g.groupBy("gram").agg(F.count(F.lit(1)).alias("w"))
    return (g.join(df_w, on="gram")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_grams"),
                 F.sum((F.col("w") > 1).cast("int")).cast("long")
                 .alias("n_shared"),
                 F.round(F.sum((F.col("w") > 1).cast("int"))
                         / F.count(F.lit(1)), 6).alias("shared_frac")))


def token_vocab(docs: DataFrame, k: int = 50) -> DataFrame:
    """Corpus token-frequency vocabulary: top-k tokens by count
    (token, n, rank), ties by token. The induction pass a tokenizer
    build starts from (count -> merge-rank); one explode + one
    map-side-combined count + a top-k. At 100 TB the count output is
    |vocab| rows, not corpus rows — the explode never materializes.

    Top-k plans as TakeOrderedAndProject (per-task bounded heaps, the
    sketch.py bottom-k pattern) — never a single-partition sort of the
    full |vocab| table; rank is a window over the k survivors only."""
    from pyspark.sql.window import Window

    toks = F.filter(F.split("text", " "), lambda t: t != "")
    counts = (docs.select(F.explode(toks).alias("token"))
              .groupBy("token").agg(F.count(F.lit(1)).alias("n")))
    topk = counts.orderBy(F.col("n").desc(), "token").limit(k)
    w = Window.orderBy(F.col("n").desc(), "token")
    return topk.withColumn("rank", F.row_number().over(w).cast("int"))


def cooccurrence_pmi(docs: DataFrame, min_df: int = 5,
                     min_pairs: int = 5, k: int = 50,
                     max_tokens_per_doc: int | None = None) -> DataFrame:
    """Document-level pointwise mutual information between token pairs:
    top-k (tok_a, tok_b, n_ab, pmi) with tok_a < tok_b, where
    pmi = ln(n_ab * N_docs / (n_a * n_b)) over document frequencies —
    the classic collocation / embedding-era association score.

    Scale shape: tokens prune to df >= min_df BEFORE pairing (the
    vocabulary filter that bounds the quadratic step), pairs generate
    per doc_id via a co-partitioned self-join (pair count bounded by
    per-doc distinct filtered tokens squared), and all frequencies are
    map-side-combined counts. A pathological 10^5-token document makes
    that square the hot task — `max_tokens_per_doc` slices each doc's
    distinct-token list (first-occurrence order, deterministic) before
    pairing; at corpus scale set it near the p99 doc length. pmi rounds
    to 6 so JVM log and the oracle's ln agree after formatting (the
    BM25 precedent)."""
    from pyspark.sql.window import Window

    toks = F.array_distinct(
        F.filter(F.split("text", " "), lambda x: x != ""))
    if max_tokens_per_doc is not None:
        toks = F.slice(toks, 1, max_tokens_per_doc)
    t = docs.select("doc_id", F.explode(toks).alias("tok"))
    dfreq = (t.groupBy("tok").agg(F.count(F.lit(1)).alias("n_t"))
             .where(F.col("n_t") >= min_df))
    tf = t.join(F.broadcast(dfreq), on="tok")
    n_docs = docs.agg(F.countDistinct("doc_id").alias("n_docs"))
    pairs = (
        tf.alias("x")
        .join(tf.alias("y"), on="doc_id")
        .where(F.col("x.tok") < F.col("y.tok"))
        .groupBy(F.col("x.tok").alias("tok_a"),
                 F.col("y.tok").alias("tok_b"),
                 F.col("x.n_t").alias("n_a"),
                 F.col("y.n_t").alias("n_b"))
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .where(F.col("n_ab") >= min_pairs))
    scored = (pairs.crossJoin(F.broadcast(n_docs))
              .select("tok_a", "tok_b", "n_ab",
                      F.round(F.log((F.col("n_ab") * F.col("n_docs"))
                                    / (F.col("n_a") * F.col("n_b"))), 6)
                      .alias("pmi")))
    # Top-k as TakeOrderedAndProject (per-task bounded heaps), then
    # rank via a window over the k survivors only — never a
    # single-partition sort of the full pruned-pair table.
    topk = scored.orderBy(F.col("pmi").desc(), "tok_a", "tok_b").limit(k)
    w = Window.orderBy(F.col("pmi").desc(), "tok_a", "tok_b")
    return topk.withColumn("rank", F.row_number().over(w).cast("int"))


def bigram_lm_scores(docs: DataFrame, alpha: float = 0.1) -> DataFrame:
    """CCNet-style language-model quality signal: score every document
    by the average log-probability of its word bigrams under an
    add-alpha-smoothed bigram model TRAINED ON THE CORPUS ITSELF
    (self-perplexity — boilerplate and gibberish score low against the
    corpus distribution, which is exactly the filtering signal).
    (doc_id, n_bigrams, avg_logprob); higher is more fluent; docs with
    no bigram (<2 tokens) are excluded.

    logp(b|a) = ln((c_ab + alpha) / (c_a + alpha * V)), with c_* corpus
    counts and V the unigram vocabulary size. Per-bigram logp rounds to
    6 (JVM log vs oracle ln — the BM25 precedent) before the per-doc
    mean. Scale shape: bigram and unigram counts are map-side-combined
    aggregates over exploded digests-free grams; the per-doc score is
    one gram-keyed join (counts side ~|observed bigrams|) + one doc_id
    aggregate — the dup-gram plan with a probability attached. A real
    KenLM slots in behind the same output schema as a pandas UDF."""
    from mms_rdf_spark.operators.dedup import _tokens, word_ngrams

    toks = _tokens(F.col("text"))
    # true bigrams only: word_ngrams emits one truncated gram for
    # docs shorter than n — those contain no space and are dropped
    bi = F.filter(word_ngrams(toks, 2), lambda g: g.contains(" "))
    doc_bi = docs.select("doc_id", F.explode(bi).alias("bg"))
    c_ab = doc_bi.groupBy("bg").agg(F.count(F.lit(1)).alias("n_ab"))
    uni = docs.select(F.explode(toks).alias("tok"))
    c_a = uni.groupBy("tok").agg(F.count(F.lit(1)).alias("n_a"))
    vocab = uni.agg(F.countDistinct("tok").alias("v"))
    logp = F.round(
        F.log((F.col("n_ab") + alpha)
              / (F.col("n_a") + alpha * F.col("v"))), 6)
    # aggregate in EXACT integer micro-units: a float mean of round-6
    # values still sums order-dependently and flips the last digit at
    # round boundaries (21/5000 docs at sf0.1 did) — summing longs is
    # associative, so both engines divide the identical integer
    scored = (doc_bi
              .join(c_ab, on="bg")
              .withColumn("tok", F.split("bg", " ")[0])
              .join(c_a, on="tok")
              .crossJoin(F.broadcast(vocab))
              .select("doc_id",
                      F.round(logp * 1e6, 0).cast("long").alias("lp_u")))
    n = F.count(F.lit(1))
    return (scored.groupBy("doc_id")
            .agg(n.alias("n_bigrams"),
                 F.round((F.sum("lp_u") / n) / 1e6, 6)
                 .alias("avg_logprob")))


def inverted_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_postings: int = 32,
) -> DataFrame:
    """Retrieval-index construction: (token, df, postings) where
    postings is the first `max_postings` docs by id as a "doc:tf"
    comma string. `df` counts ALL docs containing the token (computed
    before the cap), so idf stays exact while hot-token posting lists
    (stopwords) are bounded — the shard-size cap every real inverted
    index applies; the serialized-string form is the cross-engine-
    hashable stand-in for a posting array.

    Plan: explode -> (token, doc) count (map-side combined) -> one
    token-keyed window pass for df + rank -> ordered fold. Hot tokens
    are a skewed WINDOW partition, not a collect: the cap bounds the
    fold, and the (token, doc) aggregate bounds the explode before any
    shuffle of raw positions.
    """
    from pyspark.sql.window import Window

    toks = docs.select(
        F.col(id_col).alias("_d"),
        F.explode(_toks(F.col(text_col))).alias("token"))
    tf = toks.groupBy("token", "_d").agg(F.count(F.lit(1)).alias("_tf"))
    w = Window.partitionBy("token")
    wo = w.orderBy("_d")
    ranked = (tf.withColumn("df", F.count(F.lit(1)).over(w))
              .withColumn("_rn", F.row_number().over(wo))
              .where(F.col("_rn") <= max_postings))
    return (ranked.groupBy("token", "df")
            .agg(F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_d", "_tf"))),
                    lambda x: F.concat(x["_d"].cast("string"),
                                       F.lit(":"),
                                       x["_tf"].cast("string"))),
                ",").alias("postings")))


def readability(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Flesch reading-ease per document from the three classic
    counts: words (whitespace tokens), sentences ([.!?]+ runs,
    minimum 1), and syllables (vowel-group runs, minimum 1 per word
    approximated corpus-wide). Single-scan column math; the two run
    counts are genuine regexes (runs have no translate() form — see
    NOTES.md on regexp thread efficiency; this is a per-doc metric,
    not the curation hot path). score = 206.835 − 1.015·(W/S) −
    84.6·(Syl/W), one float expression over exact counts, rounded 4.
    """
    text = F.col(text_col)
    words = F.greatest(F.size(_toks(text)), F.lit(1))
    sentences = F.greatest(
        F.regexp_count(text, F.lit(r"[.!?]+")), F.lit(1))
    syllables = F.greatest(
        F.regexp_count(text, F.lit(r"[aeiouAEIOU]+")), words)
    return docs.select(
        F.col(id_col), words.alias("n_words"),
        sentences.alias("n_sentences"),
        syllables.alias("n_syllables"),
        F.round(F.lit(206.835)
                - F.lit(1.015) * (words / sentences)
                - F.lit(84.6) * (syllables / words),
                4).alias("flesch"))


def keywords_tfidf(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Top-k characteristic keywords per document by tf-idf:
    score = tf · ln((N+1)/(df+1)) (smoothed idf). Returns
    (doc_id, token, rank, score).

    The ranking compares tf·idf_mu as EXACT longs (idf in integer
    micro-nats, the bm25 rounding discipline), so the per-doc top-k is
    totally ordered (ties -> token) and engine-stable — a float score
    sort would tie-flip across engines. Plan: explode -> (token, doc)
    tf -> token df aggregate broadcast back -> one per-doc window.
    Stopwords demote themselves (df ~ N makes idf ~ 0); no list to
    maintain.
    """
    from pyspark.sql.window import Window

    toks = docs.select(
        F.col(id_col).alias("_d"),
        F.explode(_toks(F.col(text_col))).alias("token"))
    tf = toks.groupBy("_d", "token").agg(F.count(F.lit(1)).alias("_tf"))
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("_df"))
    n = docs.agg(F.countDistinct(id_col).alias("_n"))
    idf_mu = F.round(F.round(
        F.log((F.col("_n") + 1) / (F.col("_df") + 1)), 6) * 1e6) \
        .cast("long")
    scored = (tf.join(F.broadcast(dfreq), on="token")
              .crossJoin(F.broadcast(n))
              .withColumn("_mu", idf_mu)
              .withColumn("_s", F.col("_tf") * F.col("_mu")))
    w = Window.partitionBy("_d").orderBy(F.col("_s").desc(), "token")
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(F.col("_d").alias(id_col), "token",
                    F.col("rank").cast("int").alias("rank"),
                    F.round(F.col("_s") / 1e6, 6).alias("score")))


def stupid_backoff_scores(docs: DataFrame,
                          lam: float = 0.4) -> DataFrame:
    """Stupid-Backoff trigram LM quality signal (Brants et al. 2007),
    self-trained with LEAVE-ONE-OUT counts: every trigram occurrence
    is scored against the corpus with its own occurrence removed
    (c - 1), so hapax trigrams genuinely fall through the backoff
    chain instead of scoring themselves — the held-out-perplexity
    effect without a second corpus. Per occurrence:

        S = (c3-1)/(c12-1)                  if the LOO trigram count
          | lam   * (c23-1)/(c2-1)          survives, else the LOO
          | lam^2 * (c1-1)/(N-1)            bigram, else the LOO
          | lam^3 * 1/(N-1)                 unigram, else the floor

    (denominators are safe: each level's denominator LOO count is >=
    its numerator's). Returns (doc_id, n_trigrams, avg_logscore);
    docs with < 3 tokens are excluded. SB scores are not normalized
    probabilities — the POINT is the ranking signal at corpus scale
    with zero smoothing hyperparameters beyond lam.

    Scale shape (the bigram_lm_scores plan widened): trigram/bigram/
    unigram counts are three map-side-combined aggregates; scoring is
    five gram-keyed joins against count tables bounded by |observed
    grams| + one broadcast scalar N; per-occurrence ln rounds to 6dp
    and accumulates in EXACT micro-unit longs (order-independent,
    hash-matches the DuckDB oracle).
    """
    from mms_rdf_spark.operators.dedup import _tokens, word_ngrams

    toks = _tokens(F.coalesce(F.col("text"), F.lit("")))
    tri = F.filter(word_ngrams(toks, 3),
                   lambda g: F.size(F.split(g, " ")) == 3)
    doc_tri = docs.select("doc_id", F.explode(tri).alias("tg"))
    bi = F.filter(word_ngrams(toks, 2), lambda g: g.contains(" "))
    c3 = doc_tri.groupBy("tg").agg(F.count(F.lit(1)).alias("n3"))
    c2 = (docs.select(F.explode(bi).alias("bg"))
          .groupBy("bg").agg(F.count(F.lit(1)).alias("n2")))
    uni = docs.select(F.explode(toks).alias("tok"))
    c1 = uni.groupBy("tok").agg(F.count(F.lit(1)).alias("n1"))
    nn = uni.agg(F.count(F.lit(1)).alias("nt"))

    parts = F.split("tg", " ")
    g = (doc_tri
         .withColumn("_b12", F.concat_ws(" ", parts[0], parts[1]))
         .withColumn("_b23", F.concat_ws(" ", parts[1], parts[2]))
         .withColumn("_w2", parts[1])
         .withColumn("_w3", parts[2])
         .join(c3, on="tg")
         .join(c2.withColumnRenamed("bg", "_b12")
               .withColumnRenamed("n2", "n12"), on="_b12")
         .join(c2.withColumnRenamed("bg", "_b23")
               .withColumnRenamed("n2", "n23"), on="_b23")
         .join(c1.withColumnRenamed("tok", "_w2")
               .withColumnRenamed("n1", "nw2"), on="_w2")
         .join(c1.withColumnRenamed("tok", "_w3")
               .withColumnRenamed("n1", "nw3"), on="_w3")
         .crossJoin(F.broadcast(nn)))
    lm = F.lit(float(lam))
    score = (
        F.when(F.col("n3") - 1 > 0,
               (F.col("n3") - 1) / (F.col("n12") - 1))
        .when(F.col("n23") - 1 > 0,
              lm * (F.col("n23") - 1) / (F.col("nw2") - 1))
        .when(F.col("nw3") - 1 > 0,
              lm * lm * (F.col("nw3") - 1) / (F.col("nt") - 1))
        .otherwise(lm * lm * lm / (F.col("nt") - 1)))
    lp_u = F.round(F.round(F.log(score), 6) * 1e6, 0).cast("long")
    n = F.count(F.lit(1))
    return (g.select("doc_id", lp_u.alias("_lpu"))
            .groupBy("doc_id")
            .agg(n.alias("n_trigrams"),
                 F.round((F.sum("_lpu") / n) / 1e6, 6)
                 .alias("avg_logscore")))


def kneser_ney_scores(docs: DataFrame,
                      discount: float = 0.75) -> DataFrame:
    """Interpolated Kneser-Ney bigram LM quality signal — the
    absolute-discounting completion of the self-trained LM family
    (add-alpha `bigram_lm_scores`, Stupid Backoff
    `stupid_backoff_scores`): per observed bigram (u, w)

        P_KN(w|u) = (c(u,w) - d) / c(u)
                  + d * N1+(u,*) / c(u) * (N1+(*,w) / B)

    with c(u) = total bigrams starting at u, N1+(u,*) = distinct
    continuations of u, N1+(*,w) = distinct CONTEXTS of w (the
    continuation probability — "how novel are w's contexts", the KN
    insight that downweights words frequent only inside one fixed
    phrase), B = distinct bigram types. Observed bigrams have
    c(u,w) >= 1 > d, so the max(.,0) clamp is vacuous here. Returns
    (doc_id, n_bigrams, avg_logprob); docs with < 2 tokens excluded.

    Determinism: one fixed-order float expression over exact long
    counts, ln rounded 6dp, per-doc mean over exact micro-unit longs
    — the DuckDB oracle (text_kn_scores) hash-matches.

    Scale shape: ONE bigram-type aggregate (map-side combined) is
    checkpointed and every statistic derives from it (context /
    continuation tables bounded by |vocab|, the type count a 1-row
    broadcast); scoring is three gram-keyed joins + one doc_id
    aggregate — the bigram_lm plan with KN statistics attached.
    """
    from mms_rdf_spark.operators.dedup import _tokens, word_ngrams

    toks = _tokens(F.col("text"))
    bi = F.filter(word_ngrams(toks, 2), lambda g: g.contains(" "))
    doc_bi = docs.select("doc_id", F.explode(bi).alias("bg"))
    parts = F.split("bg", " ")
    bigr = (doc_bi.groupBy("bg")
            .agg(F.count(F.lit(1)).alias("n_uw"))
            .select("bg", parts[0].alias("_u"), parts[1].alias("_w"),
                    "n_uw")
            .localCheckpoint())
    ctx = bigr.groupBy("_u").agg(F.sum("n_uw").alias("n_u"),
                                 F.count(F.lit(1)).alias("n1p_u"))
    cont = bigr.groupBy("_w").agg(F.count(F.lit(1)).alias("n1p_w"))
    bt = bigr.agg(F.count(F.lit(1)).alias("bt"))
    d = F.lit(float(discount))
    p = ((F.col("n_uw") - d) / F.col("n_u")
         + d * F.col("n1p_u") / F.col("n_u")
         * (F.col("n1p_w") / F.col("bt")))
    scored = (doc_bi
              .join(bigr, on="bg")
              .join(ctx, on="_u")
              .join(cont, on="_w")
              .crossJoin(F.broadcast(bt))
              .select("doc_id",
                      F.round(F.round(F.log(p), 6) * 1e6, 0)
                      .cast("long").alias("_lpu")))
    n = F.count(F.lit(1))
    return (scored.groupBy("doc_id")
            .agg(n.alias("n_bigrams"),
                 F.round((F.sum("_lpu") / n) / 1e6, 6)
                 .alias("avg_logprob")))


def texttiling(
    df: DataFrame,
    key_col: str,
    idx_col: str,
    text_col: str,
    c: float = 0.5,
) -> DataFrame:
    """TextTiling-style topic segmentation (Hearst, CL 1997) over any
    ordered text sequence (turns of a conversation, documents of a
    source stream): per gap between consecutive items, lexical
    cohesion = Jaccard of the two sides' distinct token sets; depth
    score = max(0, s_prev − s) + max(0, s_next − s) (the valley form);
    a gap is a boundary when its depth exceeds Hearst's cutoff
    mean(depth) − c·std(depth), computed per sequence.

    Returns (key, gap_idx, score, depth, is_boundary): gap_idx is the
    idx of the LEFT item; score/depth are 6dp. Sequences with < 2 gaps
    have no std — their gaps are never boundaries (cutoff undefined →
    false, pinned).

    Determinism: scores and depths are 6dp-rounded then held as exact
    1e6 micro-unit longs; mean/std come from exact Σd and Σd² (one
    sqrt, identical IEEE both engines); the boundary comparison is
    long-vs-identically-computed-double, so engines can never split.

    Scale shape: one (key) exchange for the ordered window (lead/lag
    over the sequence); token sets never leave their row (array
    intersect/union inside codegen); the per-key stats broadcast back
    via a window aggregate sharing the SAME partitioning. Hot keys own
    their own sequence length only.
    """
    from mms_rdf_spark.operators.dedup import _tokens

    w = Window.partitionBy("_k").orderBy("_i")
    base = df.select(F.col(key_col).alias("_k"),
                     F.col(idx_col).alias("_i"),
                     F.array_distinct(_tokens(
                         F.coalesce(F.col(text_col), F.lit(""))))
                     .alias("_t"))
    nxt = F.lead("_t").over(w)
    scored = (base
              .withColumn("_tn", nxt)
              .where(F.col("_tn").isNotNull())
              .withColumn(
                  "_s",
                  F.round(F.when(
                      F.size(F.array_union("_t", "_tn")) > 0,
                      F.size(F.array_intersect("_t", "_tn"))
                      / F.size(F.array_union("_t", "_tn")))
                      .otherwise(F.lit(0.0)), 6))
              .withColumn("_sm",
                          F.round(F.col("_s") * 1e6).cast("long")))
    d = (scored
         .withColumn("_pm", F.lag("_sm").over(w))
         .withColumn("_nm", F.lead("_sm").over(w))
         .withColumn(
             "_dm",
             (F.greatest(F.coalesce("_pm", F.col("_sm")) - F.col("_sm"),
                         F.lit(0))
              + F.greatest(F.coalesce("_nm", F.col("_sm"))
                           - F.col("_sm"), F.lit(0))).cast("long")))
    stats = Window.partitionBy("_k")
    d = (d.withColumn("_n", F.count(F.lit(1)).over(stats))
         .withColumn("_sd", F.sum("_dm").over(stats))
         .withColumn("_sd2", F.sum(F.col("_dm") * F.col("_dm"))
                     .over(stats)))
    mean = F.col("_sd") / F.col("_n")
    var = F.col("_sd2") / F.col("_n") - mean * mean
    cutoff = mean - c * F.sqrt(F.greatest(var, F.lit(0.0)))
    return d.select(
        F.col("_k").alias("key"),
        F.col("_i").cast("long").alias("gap_idx"),
        F.col("_s").alias("score"),
        F.round(F.col("_dm") / 1e6, 6).alias("depth"),
        F.when(F.col("_n") >= 2,
               F.col("_dm") > cutoff).otherwise(F.lit(False))
        .alias("is_boundary"))


def llr_collocations(docs: DataFrame, min_count: int = 5,
                     k: int = 50) -> DataFrame:
    """Dunning log-likelihood-ratio collocations (Dunning, CL 1993 —
    "Accurate Methods for the Statistics of Surprise and
    Coincidence"): top-k ADJACENT bigrams (tok_a, tok_b, n_ab, llr,
    rank) by the G² statistic over the bigram contingency table —
    the collocation score that, unlike PMI, does not explode on rare
    pairs (it weights by evidence, which is why it became the
    standard for collocation discovery and term burst detection).

    For bigram (a, b): k11 = c(a,b), R1 = c(a,·), C1 = c(·,b),
    T = total bigrams; G² = 2·Σ k_ij·ln(k_ij·T / (R_i·C_j)) over the
    four cells (0·ln0 = 0). Every ln rounds to 9dp and scales to an
    exact NANO long before the k_ij multiply, so both engines rank
    identical longs (the NB / bm25 micro-unit discipline) — a float
    G² sort would tie-flip across engines. Ties break (tok_a, tok_b).

    Plan: one explode to the (|bigram vocab|)-row count table, R/C as
    two re-aggregations OF THAT TABLE (never the corpus again), T
    carried as a window total — one scan of the corpus end to end.
    Top-k plans as TakeOrderedAndProject; rank windows over the k
    survivors only."""
    from pyspark.sql.window import Window

    t = F.filter(F.split("text", " "), lambda x: x != "")
    bigrams = F.zip_with(
        F.slice(t, 1, F.greatest(F.size(t) - 1, F.lit(0))),
        F.slice(t, 2, F.greatest(F.size(t) - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("tok_a"), b.alias("tok_b")))
    k11 = (docs.select(F.explode(bigrams).alias("bg"))
           .select("bg.tok_a", "bg.tok_b")
           .groupBy("tok_a", "tok_b")
           .agg(F.count(F.lit(1)).alias("k11")))
    r = k11.groupBy("tok_a").agg(F.sum("k11").alias("r1"))
    c = k11.groupBy("tok_b").agg(F.sum("k11").alias("c1"))
    tot = k11.agg(F.sum("k11").alias("t_all"))
    joined = (k11.join(r, on="tok_a").join(c, on="tok_b")
              .crossJoin(F.broadcast(tot))
              .where(F.col("k11") >= min_count))

    def term(kk, rr, cc):
        ln = F.round(F.round(
            F.log(kk.cast("double") * F.col("t_all")
                  / (rr.cast("double") * cc)), 9) * 1e9).cast("long")
        return F.when(kk > 0, kk * ln).otherwise(F.lit(0).cast("long"))

    k11c, r1, c1 = F.col("k11"), F.col("r1"), F.col("c1")
    t_all = F.col("t_all")
    nano = (term(k11c, r1, c1)
            + term(r1 - k11c, r1, t_all - c1)
            + term(c1 - k11c, t_all - r1, c1)
            + term(t_all - r1 - c1 + k11c, t_all - r1, t_all - c1))
    scored = joined.select(
        "tok_a", "tok_b", F.col("k11").alias("n_ab"),
        (F.lit(2) * nano).alias("_nano"))
    topk = scored.orderBy(F.col("_nano").desc(), "tok_a", "tok_b") \
        .limit(k)
    w = Window.orderBy(F.col("_nano").desc(), "tok_a", "tok_b")
    return (topk.withColumn("rank", F.row_number().over(w).cast("int"))
            .select("tok_a", "tok_b", "n_ab",
                    F.round(F.col("_nano") / 1e9, 6).alias("llr"),
                    "rank"))


def good_turing(docs: DataFrame) -> DataFrame:
    """Good-Turing frequency-of-frequencies table (Good 1953; the
    Katz-backoff / absolute-discounting ancestor): for each observed
    token count r, (r, n_r, r_star, p_token) where n_r = how many
    token types occur exactly r times, r* = (r+1)·N_{r+1}/N_r (the GT
    adjusted count; 0 where N_{r+1} is empty — simple GT, no N_r
    regression), and p_token = r*/T the smoothed per-token
    probability. The unseen-mass estimate is the r=0 row convention
    p_0 = N_1/T — readable straight off the table.

    Scale: output is |distinct counts| rows (tens), from one
    map-side-combined token count + one |vocab|-row re-aggregation;
    the N_{r+1} lookup is a self-join of that tiny table. All inputs
    to the two divisions are exact longs, so both engines divide
    identical values (6dp / 9dp rounding on the way out)."""
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    counts = (docs.select(F.explode(toks).alias("token"))
              .groupBy("token").agg(F.count(F.lit(1)).alias("r")))
    nr = counts.groupBy("r").agg(F.count(F.lit(1)).alias("n_r"))
    tot = nr.agg(F.sum(F.col("r") * F.col("n_r")).alias("t_all"))
    nxt = nr.select((F.col("r") - 1).alias("r"),
                    F.col("n_r").alias("n_r1"))
    return (nr.join(nxt, on="r", how="left")
            .crossJoin(F.broadcast(tot))
            .select(
                "r", "n_r",
                F.round((F.col("r") + 1) * F.coalesce("n_r1", F.lit(0))
                        / F.col("n_r"), 6).alias("r_star"),
                F.round((F.col("r") + 1) * F.coalesce("n_r1", F.lit(0))
                        / F.col("n_r") / F.col("t_all"), 9)
                .alias("p_token"))
            .orderBy("r"))


def bleu2_pairs(docs: DataFrame) -> DataFrame:
    """Sentence-level BLEU-2 (Papineni et al., ACL 2002) over the
    deterministic adjacent pairing: candidate = even doc_id, reference
    = doc_id + 1. The standard generation-eval metric a transcript
    pipeline needs for model-output scoring: clipped n-gram precision
    p_n = sum_type min(c_cand, c_ref) / |cand n-grams| for n=1,2, a
    brevity penalty exp(1 - r/c) when the candidate is shorter, and
    BLEU2 = BP * sqrt(p1 * p2); unsmoothed, so any zero precision
    gives 0 (the sentence-BLEU convention).

    Returns (cand_id, ref_id, m1, c1, m2, c2, bleu2) — the exact
    integer numerators/denominators ride along so the cross-engine
    hash pins the count algebra, not just the rounded float.

    Scale: n-gram counts are one explode + map-side-combined groupBy
    per order; the clipped-match join is equi on (doc_id + 1, gram) —
    a plain shuffle join whose key cardinality is |doc| x |vocab per
    doc|, no fan-out (each (cand, gram) meets at most one ref row).
    The float path is one exp and one sqrt from exact longs, rounded
    to 6dp — single-op libm divergence is measure-zero at the grid.
    """
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    base = docs.select("doc_id", toks.alias("toks"))
    t = F.col("toks")
    bigrams = F.zip_with(
        F.slice(t, 1, F.greatest(F.size(t) - 1, F.lit(0))),
        F.slice(t, 2, F.greatest(F.size(t) - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b))

    def gram_counts(col):
        return (base.select("doc_id", F.explode(col).alias("gram"))
                .groupBy("doc_id", "gram")
                .agg(F.count(F.lit(1)).alias("cnt")))

    def clipped(cnts):
        c = cnts.where(F.col("doc_id") % 2 == 0).select(
            (F.col("doc_id") + 1).alias("rid"), "doc_id", "gram",
            F.col("cnt").alias("c_cnt"))
        r = cnts.where(F.col("doc_id") % 2 == 1).select(
            F.col("doc_id").alias("rid"), F.col("gram"),
            F.col("cnt").alias("r_cnt"))
        return (c.join(r, on=["rid", "gram"])
                .groupBy("doc_id")
                .agg(F.sum(F.least("c_cnt", "r_cnt")).alias("m")))

    uni, bi = gram_counts(t), gram_counts(bigrams)
    lens = base.select(
        "doc_id", F.size("toks").alias("n1"),
        F.greatest(F.size("toks") - 1, F.lit(0)).alias("n2"))
    cand = lens.where(F.col("doc_id") % 2 == 0).select(
        F.col("doc_id").alias("cand_id"), F.col("n1").alias("c1"),
        F.col("n2").alias("c2"))
    ref = lens.where(F.col("doc_id") % 2 == 1).select(
        F.col("doc_id").alias("ref_id"), F.col("n1").alias("r1"))
    pairs = cand.join(ref, cand["cand_id"] + 1 == ref["ref_id"])
    m1 = clipped(uni).select(F.col("doc_id").alias("cand_id"),
                             F.col("m").alias("m1"))
    m2 = clipped(bi).select(F.col("doc_id").alias("cand_id"),
                            F.col("m").alias("m2"))
    j = (pairs.join(m1, on="cand_id", how="left")
         .join(m2, on="cand_id", how="left")
         .select("cand_id", "ref_id",
                 F.coalesce("m1", F.lit(0)).alias("m1"), "c1",
                 F.coalesce("m2", F.lit(0)).alias("m2"), "c2", "r1"))
    bp = F.when(F.col("c1") >= F.col("r1"), F.lit(1.0)).otherwise(
        F.exp(F.lit(1.0) - F.col("r1").cast("double") / F.col("c1")))
    zero = ((F.col("c1") == 0) | (F.col("c2") == 0)
            | (F.col("m1") == 0) | (F.col("m2") == 0))
    bleu = F.when(zero, F.lit(0.0)).otherwise(
        bp * F.sqrt((F.col("m1").cast("double") / F.col("c1"))
                    * (F.col("m2").cast("double") / F.col("c2"))))
    return j.select("cand_id", "ref_id", "m1", "c1", "m2", "c2",
                    F.round(bleu, 6).alias("bleu2"))


def jsd_contributions(docs: DataFrame, k: int = 50) -> DataFrame:
    """Per-token Jensen-Shannon divergence contributions between the
    unigram distributions of two deterministic corpus halves
    (doc_id % 2) — the distribution-shift / data-mixing diagnostic
    (symmetric, bounded by ln 2, defined even where one side is 0,
    unlike KL). For token t with counts (n_p, n_q) and totals
    (T_p, T_q):

        contrib(t) = [n_p*ln(2 n_p T_q / (n_p T_q + n_q T_p))]/(2 T_p)
                   + [n_q*ln(2 n_q T_p / (n_p T_q + n_q T_p))]/(2 T_q)

    (each pointwise term >= 0 by convexity); sum over tokens = JSD in
    nats. Returns the top-k tokens by contribution:
    (tok, n_p, n_q, jsd_contrib, rank) — the tokens that most
    distinguish the halves.

    Discipline: each ln takes a single double division of EXACT
    integer products (counts fit 2^53 far past sf1), rounds to 9dp
    and scales to a nano long (the llr/NB precedent), so both engines
    multiply identical longs; the two-term sum has a fixed order and
    `+ 0.0` normalizes a nano-rounding -0. Ordering is by the ROUNDED
    value then token, so the top-k frontier is engine-stable.

    Scale: one explode + one conditional-sum groupBy(token) (map-side
    combined), totals as a broadcast 1-row crossJoin, top-k plans as
    TakeOrderedAndProject.
    """
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    uni = (docs.select((F.col("doc_id") % 2).alias("half"),
                       F.explode(toks).alias("tok"))
           .groupBy("tok")
           .agg(F.sum(F.when(F.col("half") == 0, 1).otherwise(0))
                .alias("n_p"),
                F.sum(F.when(F.col("half") == 1, 1).otherwise(0))
                .alias("n_q")))
    tot = uni.agg(F.sum("n_p").alias("t_p"), F.sum("n_q").alias("t_q"))
    j = uni.crossJoin(F.broadcast(tot))
    n_p, n_q = F.col("n_p"), F.col("n_q")
    t_p, t_q = F.col("t_p"), F.col("t_q")

    def ln_nano(num_cnt, other_cnt, num_tot_other, den):
        # ln((2*num_cnt*num_tot_other) / den) as an exact nano long
        arg = ((F.lit(2) * num_cnt * num_tot_other).cast("double")
               / den.cast("double"))
        return F.round(F.round(F.log(arg), 9) * 1e9).cast("long")

    den = n_p * t_q + n_q * t_p
    ln_a = ln_nano(n_p, n_q, t_q, den)
    ln_b = ln_nano(n_q, n_p, t_p, den)
    term_a = F.when(n_p > 0, (n_p * ln_a).cast("double")
                    / F.lit(1e9) / (F.lit(2.0) * t_p)).otherwise(0.0)
    term_b = F.when(n_q > 0, (n_q * ln_b).cast("double")
                    / F.lit(1e9) / (F.lit(2.0) * t_q)).otherwise(0.0)
    scored = j.select(
        "tok", "n_p", "n_q",
        (F.round(term_a + term_b, 6) + F.lit(0.0)).alias("jsd_contrib"))
    topk = scored.orderBy(F.col("jsd_contrib").desc(), "tok").limit(k)
    w = Window.orderBy(F.col("jsd_contrib").desc(), "tok")
    return topk.withColumn(
        "rank", F.row_number().over(w).cast("int"))


def ngram_novelty(docs: DataFrame, n: int = 3) -> DataFrame:
    """Per-document n-gram novelty against everything EARLIER in the
    corpus (doc_id order): the fraction of a doc's distinct word
    n-gram shingles whose first corpus occurrence (min doc_id) is the
    doc itself. The corpus-ordering / dedup-pressure signal — a
    near-duplicate of earlier data scores ~0, fresh text ~1 — and the
    self-referential complement of `decontaminate` (which checks
    overlap against an external benchmark set, quality.py).

    Returns (doc_id, n_grams, n_new, novelty) for docs with >= n
    tokens (shorter docs have no shingle and are excluded — same
    convention as the shingle-based dedup family).

    Exactness: two integer counts into one division rounded to 6dp.
    Scale: explode shingles -> map-side-combined min(doc_id) per gram
    (one row per distinct gram regardless of how hot it is), then a
    gram-keyed join back — the same shape as the exact-dedup
    hash-groupBy, no quadratic pair step anywhere.
    """
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    base = docs.select("doc_id", toks.alias("toks"))
    t = F.col("toks")
    cols = [F.slice(t, i + 1, F.greatest(F.size(t) - (n - 1), F.lit(0)))
            for i in range(n)]
    grams = cols[0]
    for c in cols[1:]:
        grams = F.zip_with(grams, c, lambda a, b: F.concat_ws(" ", a, b))
    dg = (base.select("doc_id", F.explode(grams).alias("gram"))
          .distinct())
    first = dg.groupBy("gram").agg(F.min("doc_id").alias("first_doc"))
    per_doc = (dg.join(first, on="gram")
               .groupBy("doc_id")
               .agg(F.count(F.lit(1)).alias("n_grams"),
                    F.sum(F.when(F.col("first_doc") == F.col("doc_id"),
                                 1).otherwise(0)).alias("n_new")))
    return per_doc.select(
        "doc_id", "n_grams", "n_new",
        F.round(F.col("n_new") / F.col("n_grams"), 6).alias("novelty"))


def chrf3_pairs(docs: DataFrame) -> DataFrame:
    """Single-order chrF3 (character 3-gram F-score with beta = 2,
    the recall-weighted variant of Popović 2015's chrF) over the same
    deterministic adjacent pairing as `bleu2_pairs`: whitespace is
    stripped, character trigram multisets are clipped-matched
    (m = sum_gram min(c_cand, c_ref)), and with P = m/c, R = m/r the
    F-beta collapses algebraically to

        chrF3 = 5 P R / (4 P + R) = 5 m / (4 r + c)

    — ONE division of exact longs, so the score is cross-engine
    deterministic with no transcendental at all (stronger than
    BLEU's exp/sqrt). Returns (cand_id, ref_id, m, c_total, r_total,
    chrf3); pairs where either side has no trigram score 0.

    Scale: same shape as bleu2_pairs — one explode + map-side
    combined gram count, equi-join on (doc_id + 1, gram), no fan-out.
    """
    n = 3
    s = F.translate(F.coalesce(F.col("text"), F.lit("")), " ", "")
    grams_expr = F.when(
        F.length(s) >= n,
        F.expr(f"transform(sequence(1, length(translate(coalesce(text,"
               f" ''), ' ', '')) - {n - 1}),"
               f" i -> substring(translate(coalesce(text, ''), ' ',"
               f" ''), i, {n}))")
    ).otherwise(F.array().cast("array<string>"))
    base = docs.select("doc_id", F.length(s).alias("slen"),
                       grams_expr.alias("grams"))
    cnts = (base.select("doc_id", F.explode("grams").alias("gram"))
            .groupBy("doc_id", "gram")
            .agg(F.count(F.lit(1)).alias("cnt")))
    c = cnts.where(F.col("doc_id") % 2 == 0).select(
        (F.col("doc_id") + 1).alias("rid"), "doc_id", "gram",
        F.col("cnt").alias("c_cnt"))
    r = cnts.where(F.col("doc_id") % 2 == 1).select(
        F.col("doc_id").alias("rid"), F.col("gram"),
        F.col("cnt").alias("r_cnt"))
    m = (c.join(r, on=["rid", "gram"])
         .groupBy("doc_id")
         .agg(F.sum(F.least("c_cnt", "r_cnt")).alias("m"))
         .select(F.col("doc_id").alias("cand_id"), "m"))
    tot = base.select(
        "doc_id",
        F.greatest(F.col("slen") - (n - 1), F.lit(0)).cast("long")
        .alias("n_grams"))
    cand = tot.where(F.col("doc_id") % 2 == 0).select(
        F.col("doc_id").alias("cand_id"),
        F.col("n_grams").alias("c_total"))
    ref = tot.where(F.col("doc_id") % 2 == 1).select(
        F.col("doc_id").alias("ref_id"),
        F.col("n_grams").alias("r_total"))
    pairs = cand.join(ref, cand["cand_id"] + 1 == ref["ref_id"])
    j = (pairs.join(m, on="cand_id", how="left")
         .select("cand_id", "ref_id",
                 F.coalesce("m", F.lit(0)).alias("m"),
                 "c_total", "r_total"))
    chrf = F.when(F.col("m") == 0, F.lit(0.0)).otherwise(
        F.lit(5.0) * F.col("m")
        / (F.lit(4) * F.col("r_total") + F.col("c_total")))
    return j.select("cand_id", "ref_id", "m", "c_total", "r_total",
                    F.round(chrf, 6).alias("chrf3"))


def textrank_keywords(
    docs: DataFrame,
    window: int = 2,
    iters: int = 3,
    k: int = 20,
    damping: float = 0.85,
) -> DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau, EMNLP 2004):
    rank words by weighted PageRank over the corpus word-cooccurrence
    graph — the graph-centrality complement of tfidf_keywords (a word
    that glues many contexts outranks a merely frequent one).

      - nodes = lowercased whitespace tokens (the shared `_tokens`
        convention over lower(text));
      - edges = token pairs within `window` positions in a document,
        symmetrized, weight = co-occurrence count (self-pairs dropped);
      - ranks = pagerank.weighted_pagerank (r*w/W_out mass flow), so
        the determinism contract — per-round 8dp rounding, engine-side
        constants, uniform dangling redistribution — is inherited, and
        the DuckDB oracle is the same unrolled-CTE round structure as
        kg_pagerank_weighted over the pair CTE;
      - top-k by (rank DESC, token), rnk = 1-based position.

    Returns (token, rank, rnk).

    Plan/scale: pair generation is `window` lead() columns over ONE
    doc_id exchange stacked by a generator — token positions are never
    self-joined, so cost is O(window * tokens) row-linear. The graph
    is vocabulary-sized: the pagerank rounds shuffle |V|-row frames,
    and the final top-k is TakeOrderedAndProject. At 100 TB the only
    corpus-sized exchange is the doc_id window; everything after runs
    on the (much smaller) distinct-pair aggregate.
    """
    from mms_rdf_spark.operators.dedup import _tokens
    from mms_rdf_spark.operators.pagerank import weighted_pagerank

    toks = docs.select(
        "doc_id",
        F.posexplode(_tokens(F.lower(F.col("text"))))
        .alias("pos", "tok"))
    w = Window.partitionBy("doc_id").orderBy("pos")
    leads = [F.lead("tok", d).over(w).alias(f"_b{d}")
             for d in range(1, window + 1)]
    pairs = (toks.select(F.col("tok").alias("a"), *leads)
             .select("a", F.explode(F.array(
                 *[F.col(f"_b{d}") for d in range(1, window + 1)]))
                 .alias("b"))
             .where(F.col("b").isNotNull() & (F.col("a") != F.col("b"))))
    edges = (pairs.select("a", "b")
             .union(pairs.select(F.col("b").alias("a"),
                                 F.col("a").alias("b")))
             .groupBy(F.col("a").alias("src"), F.col("b").alias("dst"))
             .agg(F.count(F.lit(1)).cast("long").alias("w")))
    ranks = weighted_pagerank(edges, iters=iters, damping=damping)
    top = (ranks.orderBy(F.desc("rank"), "node").limit(k)
           .select(F.col("node").alias("token"), "rank"))
    return top.withColumn(
        "rnk", F.row_number().over(
            Window.orderBy(F.desc("rank"), "token")).cast("int"))


def rake_keywords(
    docs: DataFrame,
    k: int = 20,
) -> DataFrame:
    """RAKE keyphrase extraction (Rose et al. 2010) — MULTI-WORD
    candidate phrases, the phrase-level complement of the word-level
    textrank_keywords/keywords_tfidf: candidates are maximal runs of
    consecutive non-stopword tokens (the fixed STOPWORDS contract
    list delimits them), each word scores deg/freq over the candidate
    corpus (deg = sum of lengths of phrases containing it, freq = its
    phrase occurrences), and a phrase scores the sum of its member
    word scores — phrases built from well-connected words win.

    Exact arithmetic: word scores are 6dp micro-unit longs
    (round(deg*1e6/freq)) so the phrase sum is an exact long and
    never re-enters float summation (the NOTES grid-aligned-average
    rule); the reported score is ONE final division. Identical phrase
    strings necessarily share member words, so the per-phrase dedup
    aggregates instances (n_occ) without recomputing.

    Returns top-k (phrase, n_words, n_occ, score, rnk) by
    (score DESC, phrase).

    Plan/scale: islands come from one (doc_id)-partitioned
    row_number — a single corpus exchange; everything after runs on
    the phrase/word aggregates. Top-k is TakeOrderedAndProject.
    """
    from pyspark.sql.window import Window as W

    from mms_rdf_spark.operators.dedup import _tokens

    toks = docs.select(
        "doc_id",
        F.posexplode(_tokens(F.lower(F.col("text"))))
        .alias("pos", "tok"))
    nonstop = toks.where(~F.col("tok").isin(STOPWORDS))
    w = W.partitionBy("doc_id").orderBy("pos")
    isl = nonstop.withColumn(
        "_isl", F.col("pos") - F.row_number().over(w))
    phrases = (isl.groupBy("doc_id", "_isl")
               .agg(F.transform(
                   F.array_sort(F.collect_list(
                       F.struct(F.col("pos"), F.col("tok")))),
                   lambda s: s["tok"]).alias("_toks")))
    phrases = phrases.select(
        "doc_id", "_isl",
        F.concat_ws(" ", F.col("_toks")).alias("phrase"),
        F.size("_toks").alias("n_words"),
        F.explode("_toks").alias("tok"))
    words = (phrases.groupBy("tok")
             .agg(F.count(F.lit(1)).cast("long").alias("freq"),
                  F.sum("n_words").cast("long").alias("deg")))
    sw = words.select(
        "tok",
        F.round(F.col("deg").cast("double") * 1e6 / F.col("freq"))
        .cast("long").alias("_sw"))
    inst = (phrases.join(sw, on="tok")
            .groupBy("doc_id", "_isl", "phrase", "n_words")
            .agg(F.sum("_sw").cast("long").alias("_sm")))
    dedup = (inst.groupBy("phrase")
             .agg(F.max("n_words").cast("int").alias("n_words"),
                  F.count(F.lit(1)).cast("long").alias("n_occ"),
                  F.max("_sm").alias("_sm")))
    top = (dedup.orderBy(F.desc("_sm"), "phrase").limit(k)
           .select("phrase", "n_words", "n_occ",
                   F.round(F.col("_sm") / 1e6, 6).alias("score")))
    return top.withColumn(
        "rnk", F.row_number().over(
            W.orderBy(F.desc("score"), "phrase")).cast("int"))



def heaps_fit(docs: DataFrame) -> DataFrame:
    """Heaps' (Herdan's) law fit V(N) = k * N^beta over the corpus in
    doc_id order — the vocabulary-growth exponent (English prose
    lands ~0.4-0.6): the sibling diagnostic to zipf_fit (frequency
    spectrum) and ngram_novelty (doc-level freshness), answering
    "how fast does NEW vocabulary keep arriving at 10x the data?" —
    the tokenizer-budget planning question.

    One point per non-empty doc: after that doc, (N_i = cumulative
    tokens, V_i = cumulative distinct types). V_i comes from each
    type's FIRST corpus occurrence (min doc_id per token — one row
    per distinct type, the ngram_novelty shape), so the distinct
    count is never re-scanned per prefix. Both cumulatives ride
    prefix.global_cumsum (no single-partition window). The log-log
    OLS runs on nano-long ln values (round(ln * 1e9)), their squares
    and cross products summed as DECIMAL(38,0)/HUGEINT — exact and
    order-free; beta is one fixed-order float ratio, and ln_k uses
    the ROUNDED beta so both engines assemble identical doubles.

    Returns one row (n_points, beta, ln_k); beta/ln_k NULL when
    fewer than 2 distinct x values (degenerate regression). Empty
    corpus: 0 rows.

    Scale shape: one token-keyed exchange (min doc_id per type), one
    doc-keyed exchange, two distributed scans, a 1-row fold.

    Reference provenance: no analog in the reference (Node triple
    factory); beyond-reference text-analysis suite.
    """
    from mms_rdf_spark.operators.prefix import global_cumsum

    toks = F.filter(F.split("text", " "), lambda x: x != "")
    per_tok = docs.select("doc_id", F.explode(toks).alias("_tok"))
    ntok = (per_tok.groupBy("doc_id")
            .agg(F.count(F.lit(1)).cast("long").alias("_nt")))
    first = per_tok.groupBy("_tok").agg(F.min("doc_id").alias("_fd"))
    newt = (first.groupBy(F.col("_fd").alias("doc_id"))
            .agg(F.count(F.lit(1)).cast("long").alias("_nv")))
    pts = (ntok.join(newt, on="doc_id", how="left")
           .select("doc_id", "_nt",
                   F.coalesce(F.col("_nv"), F.lit(0)).cast("long")
                   .alias("_nv2")))
    cn = global_cumsum(pts, "doc_id", "doc_id", "_nt") \
        .withColumnRenamed("cum", "_N")
    cv = global_cumsum(cn, "doc_id", "doc_id", "_nv2") \
        .withColumnRenamed("cum", "_V")
    x = F.round(F.log(F.col("_N")) * 1e9).cast("long")
    y = F.round(F.log(F.col("_V")) * 1e9).cast("long")
    xy = cv.select(x.alias("_x"), y.alias("_y"))
    st = xy.agg(
        F.count(F.lit(1)).cast("long").alias("n_points"),
        F.sum("_x").cast("long").alias("_sx"),
        F.sum("_y").cast("long").alias("_sy"),
        F.sum(F.col("_x").cast("decimal(38,0)") * F.col("_x"))
        .cast("decimal(38,0)").alias("_sxx"),
        F.sum(F.col("_x").cast("decimal(38,0)") * F.col("_y"))
        .cast("decimal(38,0)").alias("_sxy"))
    st = st.where(F.col("n_points") > 0)
    nd = F.col("n_points").cast("double")
    sxd, syd = F.col("_sx").cast("double"), F.col("_sy").cast("double")
    num = nd * F.col("_sxy").cast("double") - sxd * syd
    den = nd * F.col("_sxx").cast("double") - sxd * sxd
    beta = F.round(num / den, 6)
    ln_k = F.round(((syd - beta * sxd) / nd) / 1e9, 6)
    return st.select(
        "n_points",
        F.when(den > 0, beta).alias("beta"),
        F.when(den > 0, ln_k).alias("ln_k"))


def lexical_diversity(docs: DataFrame) -> DataFrame:
    """Corpus-level lexical diversity panel in one row: token count,
    vocabulary size, type-token ratio, Shannon entropy of the token
    distribution (nats), and Simpson concentration — the quick
    "is this corpus template spam?" dial next to zipf_fit (slope),
    heaps_fit (growth) and hapax_ratio (tail). Low entropy + high
    Simpson at normal TTR = a few tokens dominating; boilerplate.

    Exact arithmetic: one token-count aggregate; Shannon collapses
    to H = ln N - sum(n ln n)/N with per-distinct-token nano-longs
    (the theils_u recipe) so the sum is an exact long; Simpson
    D = sum(n(n-1)) / (N(N-1)) is ONE division of exact longs
    (n(n-1) rides DECIMAL against hot-token squares). TTR = V/N.

    Returns one row (n_tokens, vocab, ttr, shannon, simpson);
    simpson NULL when N < 2. Empty corpus: 0 rows.
    """
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    counts = (docs.select(F.explode(toks).alias("_tok"))
              .groupBy("_tok")
              .agg(F.count(F.lit(1)).cast("long").alias("_n")))
    st = counts.agg(
        F.sum("_n").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("vocab"),
        F.sum(F.col("_n")
              * F.round(F.log("_n") * 1e9).cast("long"))
        .cast("long").alias("_s"),
        F.sum(F.col("_n").cast("decimal(38,0)")
              * (F.col("_n") - 1)).cast("decimal(38,0)").alias("_d"))
    st = st.where(F.col("n_tokens").isNotNull()
                  & (F.col("n_tokens") > 0))
    n = F.col("n_tokens")
    ln_nano = F.round(F.log(n) * 1e9).cast("long")
    shannon = (n * ln_nano - F.col("_s")) / (n * 1e9)
    simpson = (F.col("_d").cast("double")
               / (n.cast("double") * (n - 1)))
    return st.select(
        "n_tokens", "vocab",
        F.round(F.col("vocab") / n, 6).alias("ttr"),
        F.round(shannon, 6).alias("shannon"),
        F.when(n > 1, F.round(simpson, 6)).alias("simpson"))
