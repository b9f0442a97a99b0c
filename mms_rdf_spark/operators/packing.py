"""Token-budget sequence packing: assign documents to training shards.

The step between a curated corpus and a training run: documents are
packed into fixed-token-budget shards (sequence packing). Exact
bin-packing is inherently sequential; the scalable deterministic rule
used here is OFFSET PACKING — documents are laid out in a stable
order, and a document's shard is its starting token offset divided by
the budget. A shard can overflow by at most one document (the one
straddling the boundary), which trainers handle by truncation or
rollover; in exchange the assignment is one window cumsum, fully
parallel, and bit-reproducible across engines.

Scale design: a single global ordering would be ONE window partition —
a single-task bottleneck at 10^9 docs. Documents are first striped
into `groups` independent packing lanes by hash (pmod), each lane a
separate window partition packed in doc order. Lanes pack
independently and concurrently; shard ids are (lane, lane-local
shard). `groups` should be ~4x the executor count at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mms_rdf_spark.operators.dedup import _tokens


def split_expr(weights: dict[str, int] | None = None,
               id_col: str = "doc_id"):
    """The split-assignment Column: a pure function of the id column
    (compose it into any projection — no join needed to stamp splits).

    Hash-based, not random: split membership must be a pure function
    of the document id so re-runs, backfills, and incremental
    ingestion never migrate a document across splits (the classic
    leakage bug with rand()-based splits). Bucket = four hex chars of
    md5(id) folded to 0..99 (~65k combos, so nominal percentages hold
    to ±0.2% even for 1% splits) — chosen over engine hash functions
    so ANY ANSI engine (the DuckDB oracle included) recomputes the
    identical assignment."""
    weights = weights or {"train": 98, "valid": 1, "test": 1}
    if sum(weights.values()) != 100:
        raise ValueError("split weights must sum to 100")
    h = F.md5(F.col(id_col).cast("string"))
    bucket = F.lit(0)
    for i in range(1, 5):
        bucket = bucket * 31 + F.ascii(F.substring(h, i, 1))
    bucket = bucket % 100
    expr = None
    acc = 0
    for name, w in weights.items():
        acc += w
        expr = F.when(bucket < acc, F.lit(name)) if expr is None \
            else expr.when(bucket < acc, F.lit(name))
    return expr


def assign_splits(docs: DataFrame,
                  weights: dict[str, int] | None = None) -> DataFrame:
    """Deterministic train/valid/test assignment: (doc_id, split).
    See `split_expr` — this is its one-column projection form."""
    return docs.select("doc_id", split_expr(weights).alias("split"))


def pack_documents(docs: DataFrame, budget: int = 256,
                   groups: int = 8) -> DataFrame:
    """(doc_id, n_tokens, lane, shard_id, pos_in_shard).

    Deterministic: lane = pmod(doc_id, groups); within a lane, docs
    pack in doc_id order; shard = floor(exclusive-cumulative-tokens /
    budget); pos_in_shard = arrival rank within the shard."""
    toks = docs.select(
        "doc_id", F.size(_tokens(F.col("text"))).alias("n_tokens"),
        F.pmod(F.col("doc_id"), F.lit(groups)).cast("int").alias("lane"))
    w = Window.partitionBy("lane").orderBy("doc_id")
    cum_excl = (F.sum("n_tokens").over(w) - F.col("n_tokens"))
    shards = toks.withColumn(
        "shard", F.floor(cum_excl / budget).cast("int"))
    ws = Window.partitionBy("lane", "shard").orderBy("doc_id")
    return shards.select(
        "doc_id", "n_tokens", "lane",
        F.concat(F.col("lane").cast("string"), F.lit("#"),
                 F.col("shard").cast("string")).alias("shard_id"),
        F.row_number().over(ws).cast("int").alias("pos_in_shard"))


def stratified_sample(
    docs: DataFrame,
    key: str = "source",
    rates: dict[str, int] | None = None,
    default_rate: int = 25,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic hash-based stratified sampling: keep a row iff
    md5(id ':' stratum) mod 100 < rate(stratum), with per-stratum
    percentage overrides in `rates` and `default_rate` elsewhere.

    The source-rebalancing pass of a curation pipeline (downsample
    overrepresented crawl sources, keep books/code at 100%): purely a
    function of (id, stratum) — no RNG state — so the SAME rows survive
    across reruns, partitionings, and engines (the oracle mirrors the
    hash), and any downstream incremental join sees a stable sample.
    One scan, one filter, zero shuffle; composable with assign_splits
    (which hashes a different string, so sampling and splitting stay
    independent)."""
    rates = rates or {}
    bucket = F.pmod(
        F.conv(F.substring(
            F.md5(F.concat(F.col(id_col).cast("string"), F.lit(":"),
                           F.col(key))), 1, 6), 16, 10).cast("long"),
        F.lit(100))
    rate = F.lit(default_rate)
    for stratum, pct in sorted(rates.items()):
        rate = F.when(F.col(key) == stratum, F.lit(pct)).otherwise(rate)
    return docs.where(bucket < rate)


def weighted_sample(
    docs: DataFrame,
    weight_col: str,
    n: int = 50,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (Efraimidis-Spirakis A-ES): each row draws key = u^(1/w) with u a
    hash-derived uniform in (0,1) — md5 of the id, no RNG state — and
    the n largest keys win. Inclusion probability is proportional to
    weight, the sample is reproducible across reruns/partitions/
    engines, and selection is a TakeOrderedAndProject top-n (per-task
    heap + driver merge, no global sort). Keys round to 9 so both
    engines' pow() agree after formatting. Rows with weight <= 0 are
    excluded (zero chance mass)."""
    if "sample_key" in docs.columns:
        raise ValueError("weighted_sample: input already has a "
                         "'sample_key' column; rename it first")
    u = (F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 12),
                16, 10).cast("double") + 1.0) / float(2 ** 48)
    key = F.round(F.pow(u, F.lit(1.0) / F.col(weight_col)), 9)
    return (docs.where(F.col(weight_col) > 0)
            .withColumn("sample_key", key)
            .orderBy(F.col("sample_key").desc(), F.col(id_col))
            .limit(n))


def length_bucketed_batches(
    docs: DataFrame,
    batch_size: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Length-bucketed training batches: documents sorted by token
    count (ties by id) and cut into consecutive groups of
    `batch_size`, so each batch pads to its own max length instead of
    the corpus max — the standard dynamic-batching trick that cuts
    padding FLOPs for non-packed (padded) training. Returns
    (doc_id, n_tokens, batch_id, pos_in_batch).

    Scale shape: the global length order comes from link.global_rank
    (repartitionByRange + per-partition offsets) — never a
    single-partition window — and batch/pos are pure arithmetic on the
    rank. Deterministic: the order is total, so assignments are
    bit-stable across engines and repartitionings. Token definition is
    shared with curate/textstats (dedup._tokens)."""
    from mms_rdf_spark.operators.link import global_rank

    d = docs.select(F.col(id_col),
                    F.size(_tokens(F.col(text_col))).alias("n_tokens"))
    ranked = global_rank(d, "n_tokens", id_col)
    r0 = F.col("rank") - 1
    return ranked.select(
        id_col, "n_tokens",
        F.floor(r0 / batch_size).cast("long").alias("batch_id"),
        (F.pmod(r0, F.lit(batch_size)) + 1).cast("int")
        .alias("pos_in_batch"))


def padding_waste(batches: DataFrame) -> DataFrame:
    """Padding overhead audit for a (n_tokens, batch_id) assignment:
    one row per batch with the tokens a pad-to-batch-max trainer
    burns. Σ(max - n_tokens) over members; the metric
    length_bucketed_batches exists to minimize. Map-side combinable
    aggregate on batch_id."""
    return (batches.groupBy("batch_id")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.max("n_tokens").alias("max_tokens"),
                 (F.max("n_tokens") * F.count(F.lit(1))
                  - F.sum("n_tokens")).cast("long").alias("pad_tokens")))


def chunk_documents(docs: DataFrame, size: int = 32,
                    stride: int = 24) -> DataFrame:
    """RAG-style sliding-window chunking: split each document into
    token windows of `size` tokens advancing by `stride` (overlap =
    size - stride), emitting (doc_id, chunk_idx, start_tok, n_tokens,
    chunk_text). The chunk count is exact integer math —
    ceil(max(n - size, 0) / stride) + 1 — so every token lands in at
    least one chunk and an empty document still yields one empty chunk
    (retrievers index the doc either way).

    Scale shape: a pure narrow transformation — tokens + posexplode +
    slice are all per-row, ZERO shuffles at any corpus size; chunk
    blow-up is bounded by size/stride per token.
    """
    toks = _tokens(F.coalesce(F.col("text"), F.lit("")))
    n_chunks = (
        (F.greatest(F.size(toks) - size, F.lit(0)) + (stride - 1))
        .cast("long") / stride).cast("long") + 1
    with_toks = docs.select(
        "doc_id", toks.alias("_t"), n_chunks.alias("_nc"))
    return (
        with_toks.select(
            "doc_id", "_t",
            F.posexplode(F.sequence(F.lit(0), F.col("_nc") - 1))
            .alias("chunk_idx", "_c"))
        .select(
            "doc_id",
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            (F.col("chunk_idx") * stride).cast("long").alias("start_tok"),
            F.slice(F.col("_t"), F.col("chunk_idx") * stride + 1,
                    F.lit(size)).alias("_w"))
        .select("doc_id", "chunk_idx", "start_tok",
                F.size("_w").cast("long").alias("n_tokens"),
                F.concat_ws(" ", "_w").alias("chunk_text"))
    )
