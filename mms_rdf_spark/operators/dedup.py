"""Deduplication operators for training-data pipelines over `documents`.

Everything is deterministic and cross-engine reproducible (the pytest/
driver oracle re-computes each in DuckDB): hash functions are md5 on
explicit string encodings, never engine-internal hash(), so Spark and
any ANSI engine agree bit-for-bit.

Scale notes (the 100 TB story for each):
  - exact: one groupBy on a 32-char digest — minimal shuffle width;
    at scale this is the classic first pass that drops ~30% of a crawl.
  - minhash/LSH: signatures are per-doc (narrow, no shuffle beyond the
    token explode's map-side combine); banding turns all-pairs into
    per-bucket joins. Bucket sizes are the skew knob: hot buckets
    (boilerplate docs) are capped by AQE skew split + the band salt.
  - simhash: one explode + groupBy(doc) with map-side partial sums.
  - ngram-jaccard: quadratic verifier — only ever run WITHIN LSH/
    block buckets at scale (here also exposed standalone for small n).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOKEN_SPLIT = " "


def _tokens(col) -> Column:
    """Whitespace word tokens, empties dropped (split semantics verified
    identical in DuckDB's string_split)."""
    return F.filter(F.split(col, TOKEN_SPLIT), lambda t: t != "")


def word_ngrams(toks: Column, n: int) -> Column:
    """Word n-gram array over a token array (docs shorter than n yield
    one truncated gram — the shared edge-case semantics every consumer
    and its SQL oracle mirror). One definition for ngram_jaccard_pairs,
    decontaminate, and textstats.repetition_stats, so the gram window
    can never drift between operators."""
    return F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )


def exact_duplicates(docs: DataFrame) -> DataFrame:
    """(doc_id, canonical_id, content_hash) for every doc that is an
    exact duplicate of an earlier doc (same md5(text); canonical = min
    doc_id in the group). Docs with no duplicate are excluded."""
    hashed = docs.select("doc_id", F.md5("text").alias("content_hash"))
    canon = (hashed.groupBy("content_hash")
             .agg(F.min("doc_id").alias("canonical_id"),
                  F.count(F.lit(1)).alias("n")))
    return (
        hashed.join(canon, on="content_hash")
        .where((F.col("n") > 1) & (F.col("doc_id") != F.col("canonical_id")))
        .select("doc_id", "canonical_id", "content_hash")
    )


def minhash_signatures(docs: DataFrame, num_hashes: int = 8) -> DataFrame:
    """Per-doc MinHash signature over word tokens: h_j(doc) =
    min(md5(j || '|' || token)). Returned wide: (doc_id, h0..h{n-1}).

    md5-of-salted-token is a drop-in for the classic (a*x+b) mod p
    family; min over a 32-hex-digit string is a uniform order statistic
    with the same collision semantics, and is portable across engines.
    """
    toks = docs.select(
        "doc_id", F.explode(F.array_distinct(_tokens(F.col("text")))).alias("tok"))
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{j}|"), F.col("tok")))).alias(f"h{j}")
        for j in range(num_hashes)
    ]
    return toks.groupBy("doc_id").agg(*aggs)


# buckets wider than this are sub-salted before the pair join. The
# default sits above every bucket in the test corpora (sf0.1 max
# observed: 2357) so small-scale output is byte-identical to the
# uncapped plan; at 100 TB the cap is the knob that bounds the worst
# task at ~MAX_BUCKET^2 / (2 * n_salts) pairs. Same mechanism as
# link.py MAX_BLOCK sub-salting, with n_salts sized from the overflow
# so a 10^6-doc boilerplate bucket still lands at ~MAX_BUCKET rows per
# salt group instead of a fixed 1/16 haircut.
MAX_BUCKET = 4096

# buckets wider than this are decomposed into a g x g triangle of join
# cells so their quadratic pair generation parallelizes across ~g^2/2
# tasks instead of one (round-6 straggler fix: at sf0.1 two ~2.3k-doc
# buckets generated ~5.4M pairs in TWO single tasks while 30 cores sat
# idle — guide §2.5 "split hot keys"). Unlike the salt cap this is
# LOSSLESS: every in-bucket pair is still emitted exactly once; only
# the task layout changes. ~(width/PARALLEL_BUCKET)^2/2 pairs per cell
# bounds the worst task; with MAX_BUCKET salting above it, g <=
# ceil(MAX_BUCKET / PARALLEL_BUCKET) = 8 rows of replication per side.
PARALLEL_BUCKET = 512


def _banded_keys(docs: DataFrame, num_hashes: int, bands: int) -> DataFrame:
    """(doc_id, band, key): one LSH bucket key per band per doc."""
    rows = num_hashes // bands
    sig = minhash_signatures(docs, num_hashes)
    band_cols = []
    for b in range(bands):
        parts = [F.col(f"h{b * rows + r}") for r in range(rows)]
        band_cols.append(
            F.struct(F.lit(b).alias("band"),
                     F.md5(F.concat_ws("|", *parts)).alias("key")))
    return sig.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("bk")
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))


def capped_bucket_pairs(
    banded: DataFrame, id_col: str = "doc_id",
    max_bucket: int | None = MAX_BUCKET,
    parallel_bucket: int | None = PARALLEL_BUCKET,
) -> DataFrame:
    """In-bucket pair join with hot-bucket sub-salting.

    banded: (id_col, band, key). Buckets wider than `max_bucket` are
    split into ceil(width / max_bucket) salt groups on crc32(id), and
    pairs are generated only WITHIN a salt group — bounding the worst
    single task at ~max_bucket^2/2 pairs regardless of how degenerate
    the corpus is (boilerplate crawls routinely put 10^6 docs in one
    band bucket; uncapped that is 10^12 pairs in one task).

    Trade (documented, same as link.py sub-blocking): pairs crossing
    salt groups inside an OVERSIZED bucket are dropped — but the salt
    is derived from md5('<band>|<id>'), i.e. BAND-DEPENDENT, so a pair
    split apart in one band's salting gets an independent 1/n_salts
    chance of co-residing in every other band's. (With a
    band-independent salt the degenerate corpus — identical docs,
    every band one hot bucket — would partition identically in all
    bands and cross-salt recall would be 0. And the hash must be
    md5, NOT crc32: CRC is linear, so for same-length ids
    crc32('<band>|<id>') decomposes into band-term XOR id-term and the
    band term CANCELS in the same-group equality — every band then
    splits the same pairs, silently defeating recovery; measured
    recall 0.70 with crc32 vs 1.00 with md5 on the adversarial
    fixture. Recall after capping ≈ 1 - (1 - 1/n_salts)^bands per
    lost pair.) `lsh_bucket_stats` reports exactly which buckets were
    salted and the pair volume forgone so the drop is observable,
    never silent. max_bucket=None disables capping (the exact
    small-scale plan).
    """
    # materialize the banded-key table ONCE: it is referenced by the
    # hot-bucket aggregate AND both sides of the pair self-join, and
    # without the checkpoint each reference re-runs the upstream
    # minhash pipeline (measured at sf0.1: 4 full corpus scans +
    # signature aggregates in one plan; guide §8 "decide with small
    # rows" — the banded table IS the lightweight proxy: one short row
    # per (id, band), never the documents themselves)
    banded = banded.localCheckpoint()
    thresholds = [t for t in (max_bucket, parallel_bucket)
                  if t is not None]
    if thresholds:
        # broadcast ONLY the oversized buckets: on a healthy corpus the
        # full width table is ~one row per (id, band) — billions of
        # rows at 10^9 docs, an OOM as a broadcast — while buckets
        # wider than the smallest threshold are few by construction
        # (at most n_rows / threshold). Rows in healthy buckets miss
        # the left join: salt 0, one join cell.
        wide = (banded.groupBy("band", "key")
                .agg(F.count(F.lit(1)).alias("_bn"))
                .where(F.col("_bn") > min(thresholds)))
        banded = banded.join(F.broadcast(wide), on=["band", "key"],
                             how="left")
    else:
        banded = banded.withColumn("_bn", F.lit(None).cast("long"))
    if max_bucket is not None:
        salt_hash = F.conv(
            F.substring(F.md5(F.concat_ws("|", F.col("band"),
                                          F.col(id_col).cast("string"))),
                        1, 15), 16, 10).cast("long")
        banded = banded.withColumn(
            "_salt",
            F.when(F.col("_bn") > max_bucket,
                   salt_hash
                   % F.ceil(F.col("_bn") / max_bucket).cast("long"))
            .otherwise(F.lit(0)))
    else:
        banded = banded.withColumn("_salt", F.lit(0))
    # ---- lossless triangle decomposition of wide buckets (§2.5):
    # rows in a bucket (or salt group) wider than `parallel_bucket`
    # are hashed into g groups; the pair join runs per (x, y) cell
    # with x <= y — the L side replicates a gid-x row to cells
    # (x, x..g-1), the R side to cells (0..y, y), so every unordered
    # pair lands in EXACTLY one cell (its sorted group pair), ordered
    # pairs in a diagonal cell deduped by id order. Same pair set as
    # the plain self-join; the hot bucket's quadratic work spreads
    # over g(g+1)/2 tasks instead of one.
    if parallel_bucket is not None:
        if max_bucket is not None:
            # salted buckets parallelize their per-salt-group width
            eff_width = F.when(
                F.col("_bn") > max_bucket,
                F.col("_bn") / F.ceil(F.col("_bn") / max_bucket)
            ).otherwise(F.col("_bn"))
        else:
            eff_width = F.col("_bn")
        g = F.when(F.col("_bn").isNull(), F.lit(1).cast("long")) \
            .otherwise(F.greatest(
                F.lit(1).cast("long"),
                F.ceil(eff_width / parallel_bucket).cast("long")))
        gid_hash = F.conv(
            F.substring(F.md5(F.concat_ws("|", F.lit("g"), F.col("band"),
                                          F.col(id_col).cast("string"))),
                        1, 15), 16, 10).cast("long")
        banded = banded.withColumn("_g", g) \
            .withColumn("_gid", gid_hash % F.col("_g"))
    else:
        banded = banded.withColumn("_g", F.lit(1).cast("long")) \
            .withColumn("_gid", F.lit(0).cast("long"))
    left = banded.select(
        "band", "key", "_salt", F.col(id_col).alias("_ida"),
        F.col("_gid").alias("_kx"),
        F.explode(F.sequence(F.col("_gid"), F.col("_g") - 1))
        .alias("_ky"))
    right = banded.select(
        "band", "key", "_salt", F.col(id_col).alias("_idb"),
        F.explode(F.sequence(F.lit(0).cast("long"), F.col("_gid")))
        .alias("_kx"),
        F.col("_gid").alias("_ky"))
    # AQE's byte-based coalescing is fan-out-blind and would fold the
    # quadratic in-bucket expansion into one task (measured: 111M
    # pairs single-threaded at the 10x scale point) — pin the exchange
    from mms_rdf_spark.operators.skew import pin_fanout_partitions
    left = pin_fanout_partitions(left, "band", "key", "_salt",
                                 "_kx", "_ky")
    right = pin_fanout_partitions(right, "band", "key", "_salt",
                                  "_kx", "_ky")
    return (
        left.join(right, on=["band", "key", "_salt", "_kx", "_ky"])
        .where((F.col("_kx") != F.col("_ky"))
               | (F.col("_ida") < F.col("_idb")))
        .select(F.least("_ida", "_idb").alias("a_id"),
                F.greatest("_ida", "_idb").alias("b_id"))
        .distinct()
    )


def lsh_bucket_stats(
    docs: DataFrame, num_hashes: int = 8, bands: int = 2,
    max_bucket: int = MAX_BUCKET,
) -> DataFrame:
    """Oversized-bucket report: (band, key, width, n_salts,
    est_dropped_pairs) for every bucket the cap would salt. Run (or
    sink) this alongside `lsh_candidate_pairs` at scale so the recall
    trade is measured, not assumed. est_dropped_pairs = total pairs
    minus within-salt pairs under uniform salting."""
    sizes = (_banded_keys(docs, num_hashes, bands)
             .groupBy("band", "key").agg(F.count(F.lit(1)).alias("width"))
             .where(F.col("width") > max_bucket))
    n_salts = F.ceil(F.col("width") / max_bucket).cast("long")
    total_pairs = (F.col("width") * (F.col("width") - 1) / 2).cast("long")
    per_salt = F.floor(F.col("width") / n_salts)
    within = (n_salts * per_salt * (per_salt - 1) / 2).cast("long")
    return sizes.select(
        "band", "key", "width", n_salts.alias("n_salts"),
        (total_pairs - within).alias("est_dropped_pairs"))


def lsh_candidate_pairs(
    docs: DataFrame, num_hashes: int = 8, bands: int = 2,
    max_bucket: int | None = MAX_BUCKET,
) -> DataFrame:
    """LSH banding: docs sharing any band of the MinHash signature are
    candidate near-duplicates. Returns distinct (a_id, b_id), a < b.

    shingle -> minhash -> band -> bucket-join: the standard pipeline;
    each band key is md5 over its rows so bucket keys stay short.
    Buckets wider than `max_bucket` are sub-salted (see
    `capped_bucket_pairs`) so no single task ever materializes a
    quadratic hot bucket."""
    return capped_bucket_pairs(
        _banded_keys(docs, num_hashes, bands), max_bucket=max_bucket)


def decontaminate(docs: DataFrame, benchmark: DataFrame,
                  n: int = 5) -> DataFrame:
    """Test-set decontamination: (doc_id, n_hits) for every training
    doc sharing at least one word n-gram with the benchmark corpus.

    The standard pre-training hygiene pass (drop or flag training docs
    that leak evaluation data). Shape at scale: distinct doc n-grams
    join distinct benchmark n-grams — the benchmark side is distinct
    grams only (millions, not the corpus), so the join broadcasts; the
    training side never shuffles its text, only 32-char gram digests.
    Compose with a left_anti on the result to drop contaminated docs."""
    def grams(df):
        toks = df.select("doc_id", _tokens(F.col("text")).alias("toks"))
        return toks.select(
            "doc_id",
            F.explode(F.array_distinct(
                F.transform(word_ngrams(F.col("toks"), n), F.md5)
            )).alias("gram"))

    bench_grams = grams(benchmark).select("gram").distinct()
    return (grams(docs)
            .join(F.broadcast(bench_grams), on="gram")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_hits")))


def simhash(docs: DataFrame, bits: int = 16) -> DataFrame:
    """Per-doc SimHash over distinct word tokens: bit i is the sign of
    the sum over tokens of ±1 decided by hex digit i of md5(token)
    (high nibble-bit => +1). Returns (doc_id, simhash string of 0/1).

    Portable: every engine computes the same md5 hex digits; 16 bits is
    the demo width, the same plan runs at 64."""
    toks = docs.select(
        "doc_id", F.explode(F.array_distinct(_tokens(F.col("text")))).alias("tok"))
    h = F.md5("tok")
    sums = [
        F.sum(
            F.when(F.substring(h, i + 1, 1)
                   .isin("8", "9", "a", "b", "c", "d", "e", "f"), 1)
            .otherwise(-1)
        ).alias(f"b{i}")
        for i in range(bits)
    ]
    agg = toks.groupBy("doc_id").agg(*sums)
    bit_exprs = [
        F.when(F.col(f"b{i}") >= 0, F.lit("1")).otherwise(F.lit("0"))
        for i in range(bits)
    ]
    return agg.select("doc_id", F.concat(*bit_exprs).alias("simhash"))


def ngram_jaccard_pairs(
    docs: DataFrame, n: int = 3, threshold: float = 0.4,
    max_doc_id: int | None = 200,
) -> DataFrame:
    """Word n-gram Jaccard similarity pairs: (a_id, b_id, jaccard) for
    pairs >= threshold. Quadratic — at scale this runs per LSH bucket;
    `max_doc_id` bounds the standalone demo (and the SQL oracle)."""
    d = docs if max_doc_id is None else docs.where(F.col("doc_id") < max_doc_id)
    toks = d.select("doc_id", _tokens(F.col("text")).alias("toks"))
    grams = toks.select(
        "doc_id",
        F.array_distinct(word_ngrams(F.col("toks"), n)).alias("grams"),
    ).select("doc_id", F.explode("grams").alias("gram"))
    sizes = grams.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = grams.alias("a").join(sizes.withColumnsRenamed(
        {"doc_id": "a_id", "sz": "a_sz"}), F.col("a.doc_id") == F.col("a_id"))
    b = grams.alias("b").join(sizes.withColumnsRenamed(
        {"doc_id": "b_id", "sz": "b_sz"}), F.col("b.doc_id") == F.col("b_id"))
    from mms_rdf_spark.operators.skew import pin_fanout_partitions
    a = pin_fanout_partitions(a, "gram").alias("a")  # AQE fan-out
    b = pin_fanout_partitions(b, "gram").alias("b")
    inter = (
        a.join(b, (F.col("a.gram") == F.col("b.gram"))
               & (F.col("a_id") < F.col("b_id")))
        .groupBy("a_id", "b_id", "a_sz", "b_sz")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.select(
            "a_id", "b_id",
            F.round(F.col("inter")
                    / (F.col("a_sz") + F.col("b_sz") - F.col("inter")), 6)
            .alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


def conversation_fingerprints(turns: DataFrame) -> DataFrame:
    """Conversation-level dedup keys over the KG's own substrate:
    (conv_id, n_turns, fp) where fp = md5 of the per-turn text digests
    concatenated in turn order. Joining fp to itself (the
    exact_duplicates pattern) dedups whole conversations — the
    curation family applied to transcripts rather than documents, so
    the KG ingest can drop replayed/forked conversations before
    extraction ever runs.

    Delimiter-free by construction (each turn contributes a fixed
    32-char digest, so no text can smear across turn boundaries) and
    order-deterministic (array_sort over (turn_idx, text) structs).
    One conv_id-keyed aggregate — the same partitioning extraction
    already uses, so with conv_id-bucketed ingest it is exchange-free."""
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct("turn_idx", "text"))),
        lambda s: F.md5(s["text"]))
    return (turns.groupBy("conv_id")
            .agg(F.count(F.lit(1)).alias("n_turns"),
                 F.md5(F.concat_ws("", ordered)).alias("fp")))


def containment_pairs(
    docs: DataFrame,
    n: int = 5,
    threshold: float = 0.5,
    max_df: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Directional partial-duplicate detection: pairs (a, b) where at
    least `threshold` of a's distinct word-n-gram digests also appear
    in b — the containment measure that catches quote-heavy and
    boilerplate-wrapped copies Jaccard dilutes (|A∩B|/|A| vs
    |A∩B|/|A∪B|). Returns (a_id, b_id, shared, a_grams, containment),
    both directions, a != b.

    Scale shape: pair generation joins on the gram DIGEST, and grams
    with document frequency > `max_df` are DROPPED first (boilerplate
    stop-grams are exactly the quadratic hot keys, and their ubiquity
    makes them containment noise — same observable-cap philosophy as
    the LSH buckets; count them via the df aggregate before raising).
    Shares token/gram/digest definitions with cross_doc_gram_stats and
    decontaminate, so the measures can never drift.
    """
    g = docs.select(
        F.col(id_col).alias("_d"),
        F.explode(F.array_distinct(
            F.transform(word_ngrams(_tokens(F.col(text_col)), n),
                        F.md5))).alias("gram"))
    df_w = g.groupBy("gram").agg(F.count(F.lit(1)).alias("_w"))
    # Broadcast the HOT grams (df > max_df) and anti-join them away.
    # The hot set is small by construction (same argument as the LSH
    # oversized-bucket cap above); broadcasting the KEPT grams would
    # ship the whole gram vocabulary minus a handful of stop-grams —
    # billions of rows at the 100-TB contract.
    hot = df_w.where(F.col("_w") > max_df).select("gram")
    kept = g.join(F.broadcast(hot), on="gram", how="left_anti")
    sizes = g.groupBy("_d").agg(F.count(F.lit(1)).alias("a_grams"))
    shared = (kept.select("gram", F.col("_d").alias("a_id"))
              .join(kept.select("gram", F.col("_d").alias("b_id")),
                    on="gram")
              .where(F.col("a_id") != F.col("b_id"))
              .groupBy("a_id", "b_id")
              .agg(F.count(F.lit(1)).alias("shared")))
    return (shared
            .join(sizes.withColumnRenamed("_d", "a_id"), on="a_id")
            .withColumn("containment",
                        F.round(F.col("shared") / F.col("a_grams"), 6))
            .where(F.col("containment") >= threshold)
            .select("a_id", "b_id", "shared", "a_grams",
                    "containment"))


def window_grams(docs: DataFrame, length: int, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """(doc_id, pos, gram): every FULL length-L token window of every
    doc (docs shorter than L contribute nothing). ONE definition
    shared by duplicated_spans and its streaming twin
    (streaming/dupspans.py) so the window semantics can never drift
    between them (the blocking_keys lesson)."""
    toks = (docs.select(F.col(id_col).alias("doc_id"),
                        _tokens(F.col(text_col)).alias("t"))
            .where(F.size("t") >= length))
    return toks.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.size("t") - length),
                lambda i: F.concat_ws(TOKEN_SPLIT,
                                      F.slice(F.col("t"), i + 1,
                                              length)),
            )).alias("pos", "gram"))


def duplicated_spans(
    docs: DataFrame,
    length: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact substring-level dedup (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better", arXiv:2107.06499 —
    the ExactSubstr criterion, token-granular): every MAXIMAL token
    span covered by length-L token windows that occur >= 2 times
    anywhere in the corpus (within or across docs; all occurrences
    count, including both copies). Returns one row per maximal span:
    (doc_id, span_start, span_end, span_len, n_windows) with 0-based
    inclusive token indexes. Docs shorter than L contribute no windows
    (only FULL windows count — unlike word_ngrams there is no
    truncated-gram edge case, because a truncated window is not
    evidence of an L-token duplicate).

    The reference paper builds a corpus-wide suffix array; the
    Spark-first equivalent is windowed counting, which is
    embarrassingly shuffle-parallel and needs no global ordered
    structure:
      1. one scan explodes (doc, pos, gram) with gram = L tokens
         joined by the tokenizer separator (tokens cannot contain it,
         so the join is injective);
      2. the duplicate test aggregates xxhash64(gram) FIRST — the
         count shuffle moves (8-byte hash, partial count) pairs, not
         ~L*avg_token-byte gram strings (map-side combine makes this
         per-partition-distinct);
      3. positions semi-join the >=2 hash set, then the small survivor
         set is confirmed on the EXACT gram string (a second, cheap
         window over survivors only), so a 64-bit collision can never
         mark a unique window duplicated — exactness is not
         probabilistic;
      4. gaps-and-islands per doc merges windows whose starts differ
         by <= L (overlapping or exactly adjacent) into maximal spans:
         one window exchange on doc_id.
    Worst-case skew (a boilerplate gram in millions of docs) only
    widens the hash-count groups (8-byte rows, AQE-splittable); the
    position side is never joined against itself, so there is no pair
    fan-out to cap.
    """
    if length < 1:
        raise ValueError("duplicated_spans: length must be >= 1")
    grams = window_grams(docs, length, id_col=id_col,
                         text_col=text_col) \
        .withColumn("h", F.xxhash64("gram"))
    hot = (grams.groupBy("h").agg(F.count(F.lit(1)).alias("n"))
           .where(F.col("n") >= 2).select("h"))
    survivors = grams.join(hot, on="h", how="left_semi")
    from pyspark.sql.window import Window

    dup = (survivors
           .withColumn("gn", F.count(F.lit(1)).over(
               Window.partitionBy("gram")))
           .where(F.col("gn") >= 2))
    return merge_window_spans(dup.select("doc_id", "pos"), length)


def merge_window_spans(dup: DataFrame, length: int) -> DataFrame:
    """Gaps-and-islands merge of duplicated window positions
    (doc_id, pos) into maximal spans — the shared render step of
    duplicated_spans and its streaming twin (streaming/dupspans.py),
    factored so the span semantics can never drift between them (the
    blocking_keys lesson). Windows whose starts differ by <= length
    overlap or touch; one doc_id exchange."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("doc_id").orderBy("pos")
    isl = (dup.select("doc_id", "pos")
           .withColumn("brk",
                       F.when(F.col("pos") - F.lag("pos").over(w)
                              <= length, F.lit(0)).otherwise(F.lit(1)))
           .withColumn("isl", F.sum("brk").over(w)))
    return (isl.groupBy("doc_id", "isl")
            .agg(F.min("pos").cast("long").alias("span_start"),
                 (F.max("pos") + length - 1).cast("long")
                 .alias("span_end"),
                 F.count(F.lit(1)).alias("n_windows"))
            .withColumn("span_len",
                        F.col("span_end") - F.col("span_start") + 1)
            .select("doc_id", "span_start", "span_end", "span_len",
                    "n_windows"))


def winnow_fingerprints(
    docs: DataFrame,
    k: int = 4,
    window: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
    SIGMOD 2003 — the MOSS copy-detection selector): hash every
    k-token gram (40-bit md5 prefix — 40+16 bits keeps the
    encoded key inside signed int64)
    and from every window of `window` consecutive gram hashes select
    the MINIMUM, rightmost on ties; the DISTINCT selected (pos, hash)
    pairs are the fingerprint set. The guarantee: any shared substring
    of >= window + k - 1 tokens yields at least one shared
    fingerprint, while only ~2/(window+1) of positions are kept.

    Returns (doc_id, pos, fp). Only FULL windows select (docs with
    fewer than window grams emit nothing); positions must fit 16 bits
    (65,536 tokens — chunk longer docs first, textstats.text_chunks),
    enforced by filter so an over-long doc drops observably rather
    than corrupting the tie-break encoding.

    Determinism without struct-min portability concerns: the
    (hash, rightmost-pos) argmin is encoded as ONE long,
    key = h * 2^16 + (65535 - pos) — min(key) is min hash then MAX
    pos; decode after selection. Both engines do identical int64
    arithmetic.

    Scale shape: one scan + explode; the selector is a bounded ROWS
    frame inside the per-doc window (one doc_id exchange); distinct
    over the selected ~2n/(w+1) rows is the only other exchange.
    """
    from pyspark.sql.window import Window

    toks = (docs.select(F.col(id_col).alias("doc_id"),
                        _tokens(F.col(text_col)).alias("t"))
            .where((F.size("t") >= k + window - 1)
                   & (F.size("t") - k + 1 <= 65535)))
    grams = toks.select(
        "doc_id",
        (F.size("t") - k + 1).alias("ng"),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.size("t") - k),
                lambda i: F.concat_ws(TOKEN_SPLIT,
                                      F.slice(F.col("t"), i + 1, k)),
            )).alias("pos", "gram"))
    h = F.conv(F.substring(F.md5("gram"), 1, 10), 16, 10).cast("long")
    keyed = grams.select(
        "doc_id", "ng", "pos",
        (h * 65536 + (65535 - F.col("pos"))).alias("key"))
    w = (Window.partitionBy("doc_id").orderBy("pos")
         .rowsBetween(0, window - 1))
    sel = (keyed.withColumn("sel", F.min("key").over(w))
           .where(F.col("pos") <= F.col("ng") - window))
    return (sel.select(
        "doc_id",
        (F.lit(65535) - F.col("sel") % 65536).cast("long").alias("pos"),
        # integer div, NOT floor(/): double division loses ulps on
        # 56-bit keys and decoded fps come back off by one
        F.expr("sel div 65536").cast("long").alias("fp"))
        .distinct())


def allpairs_cosine_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """All-pairs cosine similarity self-join over binary token sets
    with LOSSLESS prefix filtering (Bayardo/Ramakrishnan/Srikant,
    WWW'07; Chaudhuri et al. ICDE'06): every pair with
    cos(A,B) = |A∩B| / sqrt(|A|·|B|) >= threshold, found WITHOUT the
    quadratic all-pairs join. Returns (a_id, b_id, overlap, a_sz,
    b_sz, cosine), a_id < b_id.

    Filter math (exact longs end to end so the keep/drop decision can
    never split engines): a qualifying partner must satisfy
    ov >= t·sqrt(la·lb) and ov <= min(la,lb), so lb >= t²·la and the
    minimum possible qualifying overlap for A is minov_A = ceil(t²·la)
    — computed as integer ceil-div with T2 = round(t²·1e12). By the
    prefix principle, pairs meeting ov >= minov must share a token
    within each side's (l - minov + 1)-prefix under any common global
    token order; we order by (df asc, token) so prefixes hold the
    RAREST tokens and hot stopwords index last or never. The final
    threshold test is ov²·1e12 >= T2·la·lb in longs (safe while
    la·lb < ~9e5 distinct tokens squared — far above any real doc).

    Plan shape: one scan -> distinct (doc, token) -> df aggregate
    broadcast back -> one per-doc window for the canonical rank ->
    prefix self-join on token (pin_fanout_partitions: a bytes-small
    fan-out join, the AQE blind spot) -> distinct candidate pairs ->
    verify via token-set join restricted to candidates. The oracle is
    the BRUTE-FORCE quadratic join, so the contract row certifies the
    prefix AND positional filters are genuinely lossless — not just
    plausible.

    Positional filter (the PPJoin refinement, Xiao et al. WWW'08):
    shared prefix tokens appear in the SAME relative order on both
    sides (one global order), so for the first shared token — at
    ranks (i, j), the pair minimizing both — the true overlap is at
    most 1 + min(la−i, lb−j). Aggregating max over shared tokens of
    that bound IS the first-token bound (la−i decreases in i), so
    dropping pairs whose bound misses ov >= t·sqrt(la·lb) — compared
    as bound²·1e12 >= T2·la·lb in longs — is lossless; the bound
    rides the same pair aggregate that dedups candidates, costing
    nothing extra.
    """
    from pyspark.sql.window import Window

    from mms_rdf_spark.operators.skew import pin_fanout_partitions

    T2 = int(round(threshold * threshold * 1e12))
    toks = docs.select(
        F.col(id_col).alias("_d"),
        F.explode(F.array_distinct(_tokens(F.col(text_col))))
        .alias("tok"))
    sizes = toks.groupBy("_d").agg(F.count(F.lit(1)).alias("sz"))
    dfreq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("_df"))
    ranked = (toks.join(F.broadcast(dfreq), on="tok")
              .join(F.broadcast(sizes), on="_d")
              .withColumn("_rn", F.row_number().over(
                  Window.partitionBy("_d").orderBy("_df", "tok"))))
    minov = F.expr(f"({T2} * sz + 999999999999) div 1000000000000")
    prefix = (ranked.where(F.col("_rn") <= F.col("sz") - minov + 1)
              .select("_d", "tok", "sz", "_rn"))

    a = pin_fanout_partitions(
        prefix.select(F.col("_d").alias("a_id"),
                      F.col("sz").alias("a_sz"), "tok",
                      F.col("_rn").alias("_ri")), "tok")
    b = pin_fanout_partitions(
        prefix.select(F.col("_d").alias("b_id"),
                      F.col("sz").alias("b_sz"),
                      F.col("tok").alias("_btok"),
                      F.col("_rn").alias("_rj")), "_btok")
    scale = F.lit(1000000000000).cast("long")
    cand = (a.join(b, (F.col("tok") == F.col("_btok"))
                   & (F.col("a_id") < F.col("b_id")))
            # size filter: min(la,lb)² must reach t²·la·lb
            .where(F.least("a_sz", "b_sz") * F.least("a_sz", "b_sz")
                   * scale >= F.lit(T2) * F.col("a_sz") * F.col("b_sz"))
            .groupBy("a_id", "b_id", "a_sz", "b_sz")
            .agg(F.max(F.least(F.col("a_sz") - F.col("_ri"),
                               F.col("b_sz") - F.col("_rj")) + 1)
                 .alias("_ub"))
            # positional filter: the overlap upper bound must itself
            # clear the threshold
            .where(F.col("_ub") * F.col("_ub") * scale
                   >= F.lit(T2) * F.col("a_sz") * F.col("b_sz"))
            .select("a_id", "b_id", "a_sz", "b_sz"))

    ta = toks.select(F.col("_d").alias("a_id"), "tok")
    tb = toks.select(F.col("_d").alias("_vb"),
                     F.col("tok").alias("_vtok"))
    ov = (cand.join(ta, on="a_id")
          .join(tb, (F.col("b_id") == F.col("_vb"))
                & (F.col("tok") == F.col("_vtok")))
          .groupBy("a_id", "b_id", "a_sz", "b_sz")
          .agg(F.count(F.lit(1)).alias("overlap")))
    keep = (F.col("overlap") * F.col("overlap")
            * F.lit(1000000000000).cast("long")
            >= F.lit(T2) * F.col("a_sz") * F.col("b_sz"))
    return (ov.where(keep)
            .select("a_id", "b_id", "overlap", "a_sz", "b_sz",
                    F.round(F.col("overlap")
                            / F.sqrt(F.col("a_sz") * F.col("b_sz")),
                            6).alias("cosine")))
