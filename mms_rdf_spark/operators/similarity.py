"""Similarity search over an embedding column (`embeddings` table).

Baseline: brute-force cosine top-k — a cross join that Spark executes
as broadcast-nested-loop with the (small) query side broadcast; all
math stays in whole-stage codegen via higher-order array functions
(zip_with/aggregate), no UDF, double precision end-to-end so results
reproduce bit-for-bit against the DuckDB oracle.

Scale paths:
  - LSH random-hyperplane buckets: deterministic ±1 hyperplanes derived
    from md5(plane, dim) — no RNG state to ship; bucket key = sign-bit
    string. At 100 TB the bucket key becomes the shuffle/partition key
    and probing is a per-bucket join instead of all-pairs.
  - IVF: coarse quantizer with deterministic centroid choice (every
    k-th vector); assignment = argmin over broadcast centroids; probe =
    search only the query's cell. Both stages are broadcast joins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _dot(a, b) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _norm(a) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def _as_double(col) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def _spread(df: DataFrame) -> DataFrame:
    """Repartition ONLY when the scan arrived narrower than the
    cluster (the toy-scale case: one parquet file = one split, so a
    nested-loop scoring job would use one core). A corpus that already
    has >= defaultParallelism splits passes through untouched — at
    100 TB an unconditional repartition here would be a full shuffle
    of every embedding vector that the downstream broadcast join /
    mapInPandas does not need (round-2 verdict finding #1)."""
    p = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(p) if df.rdd.getNumPartitions() < p else df


def cosine_topk(
    embeddings: DataFrame, k: int = 5, n_queries: int = 10
) -> DataFrame:
    """Brute-force cosine top-k: for each query vector (vec_id <
    n_queries) the k nearest other vectors. Returns
    (query_id, rank, neighbor_id, score). Rank orders by
    (round(score,6) desc, neighbor_id) — the rounding makes rank stable
    across engines whose summation order differs at the ulp level."""
    e = _spread(
        embeddings.select("vec_id", _as_double(F.col("embedding")).alias("emb")))
    q = (e.where(F.col("vec_id") < n_queries)
         .select(F.col("vec_id").alias("query_id"), F.col("emb").alias("q_emb")))
    scored = (
        F.broadcast(q).crossJoin(e)
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", F.col("vec_id").alias("neighbor_id"),
            F.round(_dot(F.col("q_emb"), F.col("emb"))
                    / (_norm(F.col("q_emb")) * _norm(F.col("emb"))), 6)
            .alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "score")
    )


def cosine_topk_arrow(
    embeddings: DataFrame, k: int = 5, n_queries: int = 10
) -> DataFrame:
    """cosine_topk's Arrow formulation: per-batch numpy matmul inside
    mapInPandas instead of per-element zip_with/aggregate.

    The JVM higher-order-function form (`cosine_topk`) is O(dims) of
    expression interpretation per pair; one BLAS matmul per Arrow
    batch amortizes that to hardware FLOPs — the winning formulation
    once dims grow past a few hundred (same trade as the extractor's
    fused-vs-Arrow shoot-out, BASELINE.md). Queries are collected once
    (n_queries × dims floats — driver-side by design, like the
    hyperplane fold). Shuffle inventory: the scoring itself is
    join-free over the streamed corpus; the only exchanges are the
    per-query top-k window over the Q×B scored rows and — for a
    single-split toy input only — the _spread repartition.
    Raw scores come back from numpy and are rounded by F.round in
    Spark (np.round is half-to-even on a binary scale — NOT the
    HALF_UP decimal rounding F.round/DuckDB use; rounding engine-side
    keeps results bit-identical to cosine_topk and the SQL oracle)."""
    import numpy as np
    import pandas as pd

    e = _spread(
        embeddings.select("vec_id", _as_double(F.col("embedding")).alias("emb")))
    q_rows = sorted(e.where(F.col("vec_id") < n_queries).collect(),
                    key=lambda r: r["vec_id"])
    out_schema = "query_id long, neighbor_id long, score double"
    if not q_rows:  # no queries -> empty result, like cosine_topk
        empty = embeddings.sparkSession.createDataFrame([], out_schema)
        return empty.withColumn("rank", F.lit(0)).select(
            "query_id", "rank", "neighbor_id", "score").limit(0)
    q_ids = np.array([r["vec_id"] for r in q_rows], dtype=np.int64)
    q_mat = np.array([r["emb"] for r in q_rows])          # (Q, D)
    q_unit = q_mat / np.linalg.norm(q_mat, axis=1, keepdims=True)

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            m = np.stack(pdf["emb"].to_numpy())           # (B, D)
            m_unit = m / np.linalg.norm(m, axis=1, keepdims=True)
            s = m_unit @ q_unit.T                          # (B, Q)
            out = pd.DataFrame({
                "query_id": np.repeat(q_ids, len(ids)),
                "neighbor_id": np.tile(ids, len(q_ids)),
                "score": s.T.ravel(),
            })
            yield out[out.query_id != out.neighbor_id]

    scored = e.mapInPandas(score, schema=out_schema) \
        .withColumn("score", F.round("score", 6))
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "rank", "neighbor_id", "score"))


def hyperplane_weights(spark, planes: int = 8, dims: int = 64,
                       band: int = 0) -> DataFrame:
    """Deterministic ±1 hyperplanes: weight(p, d) = +1 iff the first
    hex digit of md5('<p>_<d>') is 0-7 (band 0; band b > 0 prefixes
    the seed with '<b>|', giving each band an independent hyperplane
    set — the multi-band recall mechanism). Generated as a DataFrame so
    the same rule is re-computable by any SQL engine (no RNG
    transport)."""
    seed = F.concat_ws("_", F.col("plane"), F.col("dim"))
    if band:
        seed = F.concat(F.lit(f"{band}|"), seed)
    return spark.range(planes).withColumnRenamed("id", "plane").crossJoin(
        spark.range(dims).withColumnRenamed("id", "dim")
    ).select(
        "plane", "dim",
        F.when(F.substring(F.md5(seed), 1, 1)
               .isin(*list("01234567")), F.lit(1.0)).otherwise(F.lit(-1.0))
        .alias("w"),
    )


def _bucket_expr(spark, emb: Column, planes: int, band: int = 0) -> Column:
    """Sign-bit bucket string for one band: the hyperplane set is
    collected once (planes*dims tiny, driver-side by design) and folded
    into column expressions, so the scan stays narrow (no join)."""
    by_plane: dict[int, list[float]] = {}
    for r in hyperplane_weights(spark, planes, band=band).collect():
        by_plane.setdefault(r["plane"], []).append((r["dim"], r["w"]))
    bit_exprs = []
    for p in sorted(by_plane):
        plane_arr = F.array(
            *[F.lit(w) for _, w in sorted(by_plane[p])])
        bit_exprs.append(
            F.when(_dot(emb, plane_arr) >= 0, F.lit("1"))
            .otherwise(F.lit("0")))
    return F.concat(*bit_exprs)


def lsh_buckets(
    embeddings: DataFrame, planes: int = 8
) -> DataFrame:
    """(vec_id, bucket) — bucket = sign-bit string of the vector's dot
    products with the deterministic band-0 hyperplanes."""
    e = embeddings.select("vec_id", _as_double(F.col("embedding")).alias("emb"))
    return e.select("vec_id", _bucket_expr(
        embeddings.sparkSession, F.col("emb"), planes).alias("bucket"))


def lsh_buckets_banded(
    embeddings: DataFrame, planes: int = 8, bands: int = 2
) -> DataFrame:
    """(vec_id, band, key): one independent hyperplane bucket per band,
    all computed in ONE scan (per-band bucket strings packed into an
    array of structs, then exploded — no per-band re-read, no join).
    Band 0 reproduces `lsh_buckets` exactly; bands 1..b-1 rotate the
    hyperplane md5 seed. This is the embedding twin of text LSH's
    `_banded_keys`, and what makes capped hot buckets RECOVERABLE:
    a pair split across salt groups in one band gets an independent
    chance in every other band (round-2 verdict gap #2,
    similarity.py single-bucket note)."""
    spark = embeddings.sparkSession
    e = embeddings.select("vec_id", _as_double(F.col("embedding")).alias("emb"))
    structs = [
        F.struct(F.lit(b).alias("band"),
                 _bucket_expr(spark, F.col("emb"), planes, band=b)
                 .alias("key"))
        for b in range(bands)
    ]
    return e.select(
        "vec_id", F.explode(F.array(*structs)).alias("bk")
    ).select("vec_id", F.col("bk.band").alias("band"),
             F.col("bk.key").alias("key"))


# sentinel: "use the shared dedup.MAX_BUCKET default" (distinct from
# None, which disables capping — same semantics as lsh_candidate_pairs)
_DEFAULT_CAP = object()


def embedding_near_duplicates(
    embeddings: DataFrame, threshold: float = 0.95, planes: int = 8,
    max_bucket=_DEFAULT_CAP,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, LSH-bucketed.

    The scale path for near-dup detection over vectors: pairs are only
    scored WITHIN an LSH hyperplane bucket (identical sign pattern =>
    high cosine likelihood), turning the all-pairs O(n^2) into
    per-bucket joins keyed by the bucket string — the same
    blocking-join shape as text LSH dedup, so AQE skew splitting covers
    hot buckets. Returns (a_id, b_id, score) with score >= threshold,
    a_id < b_id. Recall is bounded by the bucket resolution (`planes`);
    the brute-force `cosine_topk` is the exact baseline.

    `max_bucket` caps hot buckets exactly like dedup.capped_bucket_pairs:
    buckets wider than the cap are split into ceil(width/cap) salt
    groups on crc32(vec_id) and pairs are generated only within a salt
    group, bounding the worst task at ~cap^2/2 pairs. The sentinel
    default resolves to dedup.MAX_BUCKET (one shared knob);
    max_bucket=None disables capping entirely — the same None
    semantics as lsh_candidate_pairs. Unlike multi-band text LSH, a
    vector has ONE bucket, so cross-salt pairs in an oversized bucket
    have no second band to recover them: at >=10^6 vectors (every
    2^planes bucket hot) pick planes so buckets stay under the cap, or
    pass None and accept the quadratic."""
    if max_bucket is _DEFAULT_CAP:
        from mms_rdf_spark.operators.dedup import MAX_BUCKET
        max_bucket = MAX_BUCKET
    b = lsh_buckets(embeddings, planes)
    if max_bucket is not None:
        hot = (b.groupBy("bucket").agg(F.count(F.lit(1)).alias("_bn"))
               .where(F.col("_bn") > max_bucket))  # tiny by construction
        b = b.join(F.broadcast(hot), on="bucket", how="left").withColumn(
            "_salt",
            F.when(F.col("_bn").isNotNull(),
                   F.crc32(F.col("vec_id").cast("string"))
                   % F.ceil(F.col("_bn") / max_bucket).cast("long"))
            .otherwise(F.lit(0))).drop("_bn")
    else:
        b = b.withColumn("_salt", F.lit(0))
    e = embeddings.select("vec_id", _as_double(F.col("embedding")).alias("emb")) \
        .join(b, on="vec_id")
    # pin the pair exchange — AQE's byte-based coalescing is blind to
    # the quadratic in-bucket fan-out (see skew.pin_fanout_partitions)
    from mms_rdf_spark.operators.skew import pin_fanout_partitions
    e = pin_fanout_partitions(e, "bucket", "_salt")
    L, R = e.alias("l"), e.alias("r")
    pairs = L.join(R, (F.col("l.bucket") == F.col("r.bucket"))
                   & (F.col("l._salt") == F.col("r._salt"))
                   & (F.col("l.vec_id") < F.col("r.vec_id")))
    scored = pairs.select(
        F.col("l.vec_id").alias("a_id"), F.col("r.vec_id").alias("b_id"),
        F.round(_dot(F.col("l.emb"), F.col("r.emb"))
                / (_norm(F.col("l.emb")) * _norm(F.col("r.emb"))), 6)
        .alias("score"))
    return scored.where(F.col("score") >= threshold)


def embedding_near_duplicates_mb(
    embeddings: DataFrame, threshold: float = 0.95, planes: int = 8,
    bands: int = 2, max_bucket=_DEFAULT_CAP,
) -> DataFrame:
    """Multi-band embedding near-duplicates: `bands` independent
    hyperplane bucket sets (lsh_buckets_banded), candidate pairs =
    docs sharing ANY band's bucket, generated through the SAME capped
    in-bucket join as text LSH (dedup.capped_bucket_pairs, hot buckets
    sub-salted with a band-dependent salt), then exact cosine
    rescoring. Returns (a_id, b_id, score >= threshold), a_id < b_id.

    This closes the single-band recall gap: with one band a vector has
    ONE bucket, so pairs split across salt groups of an oversized
    bucket are unrecoverable; with b bands a split pair is lost only
    if it lands in different salt groups in EVERY band —
    P(miss) ≈ (1 - 1/n_salts)^b. bands=1 reproduces
    `embedding_near_duplicates` row-for-row (pinned in tests). The
    extra cost is one more bucket-string column per band on the same
    single scan + a b-times-wider (still capped) candidate join —
    the standard LSH recall/cost dial."""
    if max_bucket is _DEFAULT_CAP:
        from mms_rdf_spark.operators.dedup import MAX_BUCKET
        max_bucket = MAX_BUCKET
    from mms_rdf_spark.operators.dedup import capped_bucket_pairs

    banded = lsh_buckets_banded(embeddings, planes, bands)
    pairs = capped_bucket_pairs(banded, id_col="vec_id",
                                max_bucket=max_bucket)
    e = embeddings.select("vec_id",
                          _as_double(F.col("embedding")).alias("emb"))
    scored = (
        pairs
        .join(e.select(F.col("vec_id").alias("a_id"),
                       F.col("emb").alias("a_emb")), on="a_id")
        .join(e.select(F.col("vec_id").alias("b_id"),
                       F.col("emb").alias("b_emb")), on="b_id")
        .select(
            "a_id", "b_id",
            F.round(_dot(F.col("a_emb"), F.col("b_emb"))
                    / (_norm(F.col("a_emb")) * _norm(F.col("b_emb"))), 6)
            .alias("score"))
    )
    return scored.where(F.col("score") >= threshold)


def neardup_clusters(
    embeddings: DataFrame, threshold: float = 0.95, planes: int = 8,
    bands: int = 2, max_bucket=_DEFAULT_CAP,
) -> DataFrame:
    """Semantic duplicate CLUSTERS: transitive closure of the
    multi-band near-dup pairs via connected components →
    (vec_id, cluster_id), cluster_id = min vec_id in the component.
    Only vectors participating in at least one near-dup pair appear
    (every other vector is trivially its own cluster).

    This is the cluster-canonical upgrade over pairwise min-id: with
    pairs (1,2) and (2,3), greedy min-id drops 2 AND 3; here 2 and 3
    share cluster 1 and exactly one survivor per semantic group
    remains (`curate_semantic(policy="cluster")` uses this). CC runs
    over the PAIR set — orders of magnitude smaller than the corpus —
    with cc.py's driver fast path / pointer-jumping split."""
    from mms_rdf_spark.operators.cc import connected_components

    pairs = embedding_near_duplicates_mb(
        embeddings, threshold=threshold, planes=planes, bands=bands,
        max_bucket=max_bucket)
    comps = connected_components(pairs, src="a_id", dst="b_id")
    return comps.select(F.col("node").alias("vec_id"),
                        F.col("component").alias("cluster_id"))


def topk_lsh(embeddings: DataFrame, k: int = 5, n_queries: int = 10,
             planes: int = 4) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH
    bucket (coarse `planes` so buckets stay populated), then exact
    rescoring + rank within the bucket. The ANN trade: one bucket probe
    instead of a full scan; at 100 TB the bucket is the partition key."""
    b = lsh_buckets(embeddings, planes)
    e = embeddings.select("vec_id", _as_double(F.col("embedding")).alias("emb")) \
        .join(b, on="vec_id")
    q = (e.where(F.col("vec_id") < n_queries)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("emb").alias("q_emb"),
                 F.col("bucket").alias("q_bucket")))
    scored = (
        F.broadcast(q)
        .join(e, (F.col("bucket") == F.col("q_bucket"))
              & (F.col("vec_id") != F.col("query_id")))
        .select("query_id", F.col("vec_id").alias("neighbor_id"),
                F.round(_dot(F.col("q_emb"), F.col("emb"))
                        / (_norm(F.col("q_emb")) * _norm(F.col("emb"))), 6)
                .alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "rank", "neighbor_id", "score"))


def quantize_embeddings(embeddings: DataFrame) -> DataFrame:
    """Symmetric int8 quantization, exploded to (vec_id, dim, q, scale).

    The storage/bandwidth lever for vector columns at 100 TB: a
    float32 corpus shrinks 4x (and shuffles 4x cheaper through every
    downstream join) at ~1% cosine error. Per-vector scale =
    max|x|/127; q = round(x/scale) clamped to [-127, 127]. Pure column
    expressions; dequantize is q*scale. Exploded (long) form here so
    the cross-engine oracle compares scalar rows; the packed
    array<tinyint> form is the same expressions un-exploded."""
    e = embeddings.select("vec_id",
                          _as_double(F.col("embedding")).alias("emb"))
    scale = F.aggregate(F.col("emb"), F.lit(0.0),
                        lambda acc, x: F.greatest(acc, F.abs(x))) / 127.0
    q = e.select(
        "vec_id", F.round(scale, 9).alias("scale"),
        F.posexplode(F.col("emb")).alias("dim", "v"))
    quantized = (F.when(F.col("scale") == 0.0, F.lit(0.0))
                 .otherwise(F.round(F.col("v") / F.col("scale"), 0)))
    return q.select(
        "vec_id", F.col("dim").cast("int").alias("dim"),
        F.greatest(F.lit(-127.0), F.least(F.lit(127.0), quantized))
        .cast("int").alias("q"),
        "scale")


def embedding_bucket_stats(embeddings: DataFrame, planes: int = 8,
                           max_bucket: int = 4096) -> DataFrame:
    """Oversized-hyperplane-bucket report: (bucket, width, n_salts,
    est_dropped_pairs) — the audit to run before picking
    embedding_near_duplicates' cap (dedup.lsh_bucket_stats' embedding
    twin; unlike multi-band text LSH a vector has one bucket, so
    dropped cross-salt pairs here have no second band to recover
    them — this report is how that loss stays a DECISION, not a
    surprise)."""
    sizes = (lsh_buckets(embeddings, planes)
             .groupBy("bucket").agg(F.count(F.lit(1)).alias("width"))
             .where(F.col("width") > max_bucket))
    n_salts = F.ceil(F.col("width") / max_bucket).cast("long")
    total_pairs = (F.col("width") * (F.col("width") - 1) / 2).cast("long")
    per_salt = F.floor(F.col("width") / n_salts)
    within = (n_salts * per_salt * (per_salt - 1) / 2).cast("long")
    return sizes.select(
        "bucket", "width", n_salts.alias("n_salts"),
        (total_pairs - within).alias("est_dropped_pairs"))


def ivf_topk(embeddings: DataFrame, k: int = 5, n_queries: int = 10,
             every_k: int = 100) -> DataFrame:
    """IVF probe: exact top-k restricted to the query's coarse cell.

    The search half of the IVF pair (ivf_assign builds the index): a
    query scores only vectors assigned to ITS centroid cell — at scale
    the cell id is the partition key, so one probe touches one
    partition's worth of vectors instead of the corpus. nprobe=1 here;
    more probes = union over the n nearest cells, same plan shape.
    Recall is bounded by the quantizer, `cosine_topk` is the exact
    baseline (same trade as topk_lsh, different bucketing)."""
    cells = ivf_assign(embeddings, every_k).select("vec_id", "centroid_id")
    e = embeddings.select("vec_id",
                          _as_double(F.col("embedding")).alias("emb")) \
        .join(cells, on="vec_id")
    q = (e.where(F.col("vec_id") < n_queries)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("emb").alias("q_emb"),
                 F.col("centroid_id").alias("q_cell")))
    scored = (
        F.broadcast(q)
        .join(e, (F.col("centroid_id") == F.col("q_cell"))
              & (F.col("vec_id") != F.col("query_id")))
        .select("query_id", F.col("vec_id").alias("neighbor_id"),
                F.round(_dot(F.col("q_emb"), F.col("emb"))
                        / (_norm(F.col("q_emb")) * _norm(F.col("emb"))), 6)
                .alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "rank", "neighbor_id", "score"))


def _argmax_centroid(cent_rows) -> "tuple[Column, Column]":
    """(centroid_id, score) column pair: argmax cosine over a
    driver-collected centroid list, folded into pure array expressions
    (the J1 static-fold pattern — k*dims floats on the driver, ZERO
    shuffle per assignment; ties break to the smallest centroid_id via
    max over struct(score, -cid))."""
    best = F.array_max(F.array(*[
        F.struct(
            F.round(_dot(F.col("emb"), F.array(*[F.lit(v) for v in vec]))
                    / (_norm(F.col("emb"))
                       * F.lit(sum(v * v for v in vec) ** 0.5)), 6)
            .alias("s"),
            F.lit(-cid).alias("nc"))
        for cid, vec in cent_rows
    ]))
    return (-best["nc"]).cast("long").alias("centroid_id"), \
        best["s"].alias("score")


def _broadcast_argmax(e: DataFrame, cents: DataFrame,
                      carry_emb: bool = False) -> DataFrame:
    """Broadcast-join argmax assignment: score every (vector, centroid)
    pair via crossJoin(broadcast(cents)), then collapse to the best
    centroid per vec_id with groupBy + max(struct(score, -cid)) — the
    SAME tie rule as the static fold (_argmax_centroid), and the same
    rounded score, so the two paths are row-identical. The groupBy is
    partially aggregated map-side; since the broadcast multiplies rows
    WITHIN a partition, every vec_id collapses to one row before the
    exchange, so the shuffle carries n rows — not n*k.

    This is the scale path past ~10^5 k*dims, where collecting the
    centroids to fold them into a literal expression tree stops being
    reasonable (NOTES.md round-3 limitation #5); below that the static
    fold wins because it has NO exchange at all.

    Returns (vec_id, centroid_id, score) (+ emb when carry_emb)."""
    c = cents.select(F.col("centroid_id").cast("long").alias("_cid"),
                     F.col("c_emb"))
    score = F.round(_dot(F.col("emb"), F.col("c_emb"))
                    / (_norm(F.col("emb")) * _norm(F.col("c_emb"))), 6)
    cand = [score.alias("s"), (-F.col("_cid")).alias("nc")]
    if carry_emb:
        cand.append(F.col("emb").alias("emb"))
    best = (e.crossJoin(F.broadcast(c))
            .select("vec_id", F.struct(*cand).alias("_cand"))
            .groupBy("vec_id").agg(F.max("_cand").alias("_b")))
    out = [F.col("vec_id"),
           (-F.col("_b.nc")).cast("long").alias("centroid_id"),
           F.col("_b.s").alias("score")]
    if carry_emb:
        out.append(F.col("_b.emb").alias("emb"))
    return best.select(*out)


def ivf_train(embeddings: DataFrame, every_k: int = 100,
              iters: int = 2, fold: str = "static") -> DataFrame:
    """Lloyd's k-means for the IVF coarse quantizer (the round-2
    "trained centroids" gap): seeded deterministically (vec_id %
    every_k == 0, so any engine re-derives the init), then `iters`
    bounded iterations of
        assign: argmax rounded cosine over the collected centroids —
                pure column expressions, no shuffle (see
                _argmax_centroid; same driver-fold budget as the LSH
                hyperplanes: k*dims floats);
        update: per-dimension mean via posexplode + groupBy(centroid,
                dim) — the ONLY shuffle, and its map-side combine
                reduces the exchange to n_partitions*k*dims partial
                rows regardless of corpus size;
    with a localCheckpoint per round to truncate lineage (the cc.py
    pointer-jumping pattern). Means are rounded to 6 decimals BEFORE
    the next round so Spark and the SQL oracle iterate on bit-identical
    centroids. Empty clusters drop out (deterministic in both engines).
    Returns (centroid_id, c_emb).

    fold="static" (default) collects the centroids each round and folds
    them into the assignment expression — zero shuffle for assign, the
    right call while k*dims fits a literal tree (~10^5 floats).
    fold="broadcast" keeps the centroids distributed and assigns via
    crossJoin(broadcast) + map-side-combined argmax
    (_broadcast_argmax) — nothing ever collects to the driver, which is
    the 10^6+-centroid regime. Both paths share the rounded-cosine /
    min-id tie rule, so they produce bit-identical centroids (pinned in
    test_similarity)."""
    if fold not in ("static", "broadcast"):
        raise ValueError(f"unknown fold {fold!r}")
    e = embeddings.select("vec_id", _as_double(F.col("embedding")).alias("emb"))
    cents = (e.where(F.col("vec_id") % every_k == 0)
             .select(F.col("vec_id").alias("centroid_id"),
                     F.col("emb").alias("c_emb")))
    for _ in range(iters):
        if fold == "static":
            rows = sorted((r["centroid_id"], list(r["c_emb"]))
                          for r in cents.collect())
            cid, _score = _argmax_centroid(rows)
            # two-step select: a generator (posexplode) in the same
            # projection as the struct extraction makes the analyzer
            # drop the struct field names (FIELD_NOT_FOUND on `nc`)
            assigned = e.select(cid, "emb")
        else:
            assigned = _broadcast_argmax(e, cents, carry_emb=True) \
                .select("centroid_id", "emb")
        assigned = assigned.select(
            "centroid_id", F.posexplode("emb").alias("dim", "v"))
        cents = (
            assigned.groupBy("centroid_id", "dim")
            .agg(F.round(F.avg("v"), 6).alias("m"))
            .groupBy("centroid_id")
            .agg(F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "m"))),
                lambda s: s["m"]).alias("c_emb"))
        ).localCheckpoint()
    return cents


def ivf_assign_trained(embeddings: DataFrame, every_k: int = 100,
                       iters: int = 2, fold: str = "static") -> DataFrame:
    """ivf_assign with TRAINED centroids: (vec_id, centroid_id, score)
    where centroid_id keys the ivf_train cluster (seed vec_id) and
    score is the rounded cosine to its trained centroid. fold="static"
    (default): zero-shuffle driver-folded assignment, same as
    training's assign step. fold="broadcast": fully distributed
    crossJoin(broadcast)+argmax — the path for centroid sets too large
    to collect; row-identical to static (shared rounding + tie rule)."""
    trained = ivf_train(embeddings, every_k, iters, fold=fold)
    e = _spread(
        embeddings.select("vec_id", _as_double(F.col("embedding")).alias("emb")))
    if fold == "broadcast":
        return _broadcast_argmax(e, trained)
    cents = sorted((r["centroid_id"], list(r["c_emb"]))
                   for r in trained.collect())
    cid, score = _argmax_centroid(cents)
    return e.select("vec_id", cid, score)


def ivf_topk_trained(embeddings: DataFrame, k: int = 5,
                     n_queries: int = 10, every_k: int = 100,
                     iters: int = 2) -> DataFrame:
    """ivf_topk with TRAINED centroids: probe only the query's trained
    cell. Same plan as ivf_topk (broadcast query side, cell-key join)
    but the quantizer is the Lloyd's-trained one, so cells track the
    data distribution instead of arbitrary seed vectors — the recall
    upgrade the IVF literature trains for."""
    cents = sorted((r["centroid_id"], list(r["c_emb"]))
                   for r in ivf_train(embeddings, every_k, iters).collect())
    e = embeddings.select("vec_id", _as_double(F.col("embedding")).alias("emb"))
    cid, _score = _argmax_centroid(cents)
    cells = e.select("vec_id", "emb", cid)
    q = (cells.where(F.col("vec_id") < n_queries)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("emb").alias("q_emb"),
                 F.col("centroid_id").alias("q_cell")))
    scored = (
        F.broadcast(q)
        .join(cells, (F.col("centroid_id") == F.col("q_cell"))
              & (F.col("vec_id") != F.col("query_id")))
        .select("query_id", F.col("vec_id").alias("neighbor_id"),
                F.round(_dot(F.col("q_emb"), F.col("emb"))
                        / (_norm(F.col("q_emb")) * _norm(F.col("emb"))), 6)
                .alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "rank", "neighbor_id", "score"))


def ivf_assign(embeddings: DataFrame, every_k: int = 100) -> DataFrame:
    """IVF coarse assignment: centroids = vectors with vec_id % every_k
    == 0 (deterministic stand-in for k-means — the assignment plumbing,
    which is the Spark-side work, is identical). Returns
    (vec_id, centroid_id, score) with score = cosine to the centroid."""
    e = _spread(
        embeddings.select("vec_id", _as_double(F.col("embedding")).alias("emb")))
    cents = (e.where(F.col("vec_id") % every_k == 0)
             .select(F.col("vec_id").alias("centroid_id"),
                     F.col("emb").alias("c_emb")))
    scored = (
        e.crossJoin(F.broadcast(cents))
        .select(
            "vec_id", "centroid_id",
            F.round(_dot(F.col("emb"), F.col("c_emb"))
                    / (_norm(F.col("emb")) * _norm(F.col("c_emb"))), 6)
            .alias("score"))
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("score").desc(), F.col("centroid_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("vec_id", "centroid_id", "score")
    )


def _argmin_centroid_l2(cent_rows) -> "tuple[Column, Column]":
    """(centroid_id, dist) pair: argmin ROUNDED Euclidean distance to a
    driver-collected centroid list over the `sub` column, folded into
    pure array expressions (the L2 twin of _argmax_centroid; ties break
    to the smallest centroid_id via lexicographic struct min)."""
    best = F.array_min(F.array(*[
        F.struct(
            F.round(F.sqrt(F.aggregate(
                F.zip_with(F.col("sub"),
                           F.array(*[F.lit(v) for v in vec]),
                           lambda x, c: (x - c) * (x - c)),
                F.lit(0.0), lambda acc, x: acc + x)), 6).alias("d"),
            F.lit(cid).alias("c"))
        for cid, vec in cent_rows
    ]))
    return best["c"].cast("long").alias("code"), best["d"].alias("dist")


def _subspace(e: DataFrame, s: int, dsub: int) -> DataFrame:
    return e.select("vec_id",
                    F.slice(F.col("emb"), s * dsub + 1, dsub).alias("sub"))


def pq_train(embeddings: DataFrame, m: int = 4, every_k: int = 100,
             iters: int = 1) -> DataFrame:
    """Product-quantization codebooks: split the vector into `m` equal
    subspaces and run bounded Lloyd's k-means (L2) independently in
    each — the FAISS-style IVF+PQ storage companion: an encoded vector
    costs m codes (bytes) instead of dims floats, an ~dims*4/m
    compression of every shuffle that moves vectors. Returns
    (subspace, centroid_id, c_emb).

    Same determinism contract as ivf_train (seed = vec_id % every_k,
    per-round round-6 means, min-id ties) so the DuckDB oracle unrolls
    the identical iterations per subspace; distances are rounded
    Euclidean (sqrt is correctly-rounded IEEE in both engines)."""
    e = embeddings.select("vec_id",
                          _as_double(F.col("embedding")).alias("emb"))
    dims = len(e.select("emb").first()["emb"])
    if dims % m:
        raise ValueError(f"dims {dims} not divisible by m {m}")
    dsub = dims // m
    out = None
    for s in range(m):
        sub = _subspace(e, s, dsub)
        cents = (sub.where(F.col("vec_id") % every_k == 0)
                 .select(F.col("vec_id").alias("centroid_id"),
                         F.col("sub").alias("c_emb")))
        for _ in range(iters):
            rows = sorted((r["centroid_id"], list(r["c_emb"]))
                          for r in cents.collect())
            code, _dist = _argmin_centroid_l2(rows)
            assigned = sub.select(code.alias("centroid_id"), "sub") \
                .select("centroid_id",
                        F.posexplode("sub").alias("dim", "v"))
            cents = (
                assigned.groupBy("centroid_id", "dim")
                .agg(F.round(F.avg("v"), 6).alias("mu"))
                .groupBy("centroid_id")
                .agg(F.transform(
                    F.array_sort(F.collect_list(F.struct("dim", "mu"))),
                    lambda st: st["mu"]).alias("c_emb"))
            ).localCheckpoint()
        part = cents.select(F.lit(s).alias("subspace"),
                            "centroid_id", "c_emb")
        out = part if out is None else out.unionByName(part)
    return out


def pq_encode(embeddings: DataFrame, m: int = 4, every_k: int = 100,
              iters: int = 1) -> DataFrame:
    """PQ encoding: (vec_id, subspace, code, dist) — each subvector's
    nearest trained codeword (rounded L2, min-id ties) and its
    distance. Long format so the cross-engine oracle compares scalar
    rows; the packed array<code> form is the same values un-exploded.
    Encoding is the zero-shuffle static fold per subspace (codebooks
    are k*dims/m floats on the driver — the _argmax_centroid budget)."""
    e = embeddings.select("vec_id",
                          _as_double(F.col("embedding")).alias("emb"))
    dims = len(e.select("emb").first()["emb"])
    dsub = dims // m
    books = pq_train(embeddings, m, every_k, iters)
    out = None
    for s in range(m):
        rows = sorted((r["centroid_id"], list(r["c_emb"]))
                      for r in books.where(F.col("subspace") == s)
                      .collect())
        code, dist = _argmin_centroid_l2(rows)
        part = _subspace(e, s, dsub).select(
            "vec_id", F.lit(s).alias("subspace"), code, dist)
        out = part if out is None else out.unionByName(part)
    return out


def embedding_dim_stats(embeddings: DataFrame) -> DataFrame:
    """Per-dimension corpus statistics: (dim, mu, sigma), round-6.
    Variance uses the explicit E[x^2] - E[x]^2 form so any engine
    reproduces the exact doubles (builtin stddev implementations differ
    numerically across engines); one posexplode + one map-side-combined
    aggregate, output is dims rows."""
    x = embeddings.select(
        F.posexplode(_as_double(F.col("embedding"))).alias("dim", "v"))
    return (x.groupBy("dim")
            .agg(F.round(F.avg("v"), 6).alias("mu"),
                 F.round(F.sqrt(F.avg(F.col("v") * F.col("v"))
                                - F.avg("v") * F.avg("v")), 6)
                 .alias("sigma"))
            .select(F.col("dim").cast("int").alias("dim"), "mu", "sigma"))


def standardize_embeddings(embeddings: DataFrame) -> DataFrame:
    """Per-dimension z-scoring (whitening without rotation): the ANN
    preprocessing that stops high-variance dimensions from dominating
    L2/PQ distances. Exploded output (vec_id, dim, z) with
    z = round((v - mu) / sigma, 4) against the ROUNDED corpus stats, so
    the oracle's arithmetic matches exactly; constant dimensions
    (sigma 0) map to 0. Stats are dims rows — broadcast join; the
    packed array form is the same expression un-exploded via a
    transform over the stats folded into literals."""
    stats = embedding_dim_stats(embeddings)
    x = embeddings.select(
        "vec_id",
        F.posexplode(_as_double(F.col("embedding"))).alias("dim", "v")) \
        .withColumn("dim", F.col("dim").cast("int"))
    # + 0.0 collapses IEEE negative zero (round can emit -0.0, which
    # formats as "-0.000000" and breaks the cross-engine hash)
    return (x.join(F.broadcast(stats), on="dim")
            .select("vec_id", "dim",
                    (F.when(F.col("sigma") == 0.0, F.lit(0.0))
                     .otherwise(F.round((F.col("v") - F.col("mu"))
                                        / F.col("sigma"), 4))
                     + F.lit(0.0)).alias("z")))


def mean_pool(
    embs: DataFrame,
    group_col: str = "label",
    vec_col: str = "embedding",
    unit: float = 1e6,
    ndigits: int = 6,
) -> DataFrame:
    """Per-group mean pooling of embedding vectors (class centroids,
    conversation-level embeddings from turn vectors) as per-dimension
    ROWS (group, dim, n, mean) — the assembly back into arrays is a
    sort_array fold the caller applies when needed; rows keep the
    contract nested-type-free.

    Exactness: components quantize to integer micro-units before the
    sum (float32 inputs convert to double identically everywhere, and
    the quantized sum has no accumulation order), one division at the
    end — the same trick ivf_train uses for its k-means means. Plan:
    posexplode -> (group, dim) map-side-combined aggregate; dims
    multiply the row count, not the shuffle key space skew.
    """
    ex = embs.select(F.col(group_col).alias("grp"),
                     F.posexplode(F.col(vec_col)))
    q = F.round(F.col("col").cast("double") * F.lit(unit)).cast("long")
    return (ex.select("grp", F.col("pos").alias("dim"), q.alias("_q"))
            .groupBy("grp", "dim")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("_q").alias("_s"))
            .select(F.col("grp").alias(group_col), "dim", "n",
                    F.round(F.col("_s") / (F.col("n") * F.lit(unit)),
                            ndigits).alias("mean")))


def mmr_select(
    embeddings: DataFrame,
    query_id: int = 0,
    n_candidates: int = 20,
    k: int = 5,
    lam: float = 0.7,
) -> DataFrame:
    """Maximal-marginal-relevance diversified top-k: greedily pick the
    candidate maximizing λ·rel − (1−λ)·max_sim_to_selected — the
    standard retrieval reranker that stops near-duplicate results from
    crowding the top-k. Returns (rank, vec_id, rel, score).

    Architecture: DISTRIBUTED first-stage retrieval (broadcast query
    crossJoin, same shape as cosine_topk) narrows to `n_candidates`;
    the k greedy rounds then run as tiny DataFrame jobs (argmax =
    TakeOrdered(1); penalty = candidates x selected crossJoin, at most
    n_candidates·k rows) — never a driver loop over DATA, only over
    the k picks. Determinism: rel and pairwise sims round to 6dp
    before any comparison and the argmax tiebreaks on id, so an
    unrolled SQL oracle agrees rank-for-rank.
    """
    e = embeddings.select(
        "vec_id", _as_double(F.col("embedding")).alias("emb"))
    qv = e.where(F.col("vec_id") == query_id) \
        .select(F.col("emb").alias("q_emb"))
    cand = (e.crossJoin(F.broadcast(qv))
            .where(F.col("vec_id") != query_id)
            .select("vec_id", "emb",
                    F.round(_dot(F.col("emb"), F.col("q_emb"))
                            / (_norm(F.col("emb"))
                               * _norm(F.col("q_emb"))), 6)
                    .alias("rel"))
            .orderBy(F.col("rel").desc(), "vec_id")
            .limit(n_candidates)).localCheckpoint()
    lam_c, inv_c = F.lit(lam), F.lit(1.0) - F.lit(lam)
    first = (cand.select("vec_id", "rel",
                         F.round(lam_c * F.col("rel"), 6)
                         .alias("score"),
                         F.lit(1).alias("rank"))
             .orderBy(F.col("score").desc(), "vec_id").limit(1))
    selected = first.localCheckpoint()
    for step in range(2, k + 1):
        sel_vecs = (cand.join(selected.select("vec_id"), on="vec_id")
                    .select(F.col("vec_id").alias("_sid"),
                            F.col("emb").alias("_semb")))
        remaining = cand.join(selected.select("vec_id"), on="vec_id",
                              how="left_anti")
        pen = (remaining.crossJoin(F.broadcast(sel_vecs))
               .select("vec_id",
                       F.round(_dot(F.col("emb"), F.col("_semb"))
                               / (_norm(F.col("emb"))
                                  * _norm(F.col("_semb"))), 6)
                       .alias("_sim"))
               .groupBy("vec_id").agg(F.max("_sim").alias("_pen")))
        pick = (remaining.join(pen, on="vec_id")
                .select("vec_id", "rel",
                        F.round(lam_c * F.col("rel")
                                - inv_c * F.col("_pen"), 6)
                        .alias("score"),
                        F.lit(step).alias("rank"))
                .orderBy(F.col("score").desc(), "vec_id").limit(1))
        selected = selected.unionByName(pick).localCheckpoint()
    return selected.select("rank", "vec_id", "rel", "score")


def mmr_select_batched(
    embeddings: DataFrame,
    query_id: int = 0,
    n_candidates: int = 20,
    k: int = 5,
    lam: float = 0.7,
    m: int | None = None,
    stats: dict | None = None,
) -> DataFrame:
    """Batched MMR: identical output to `mmr_select` (pick-for-pick,
    score-for-score) in ~k/m distributed rounds instead of k.

    Per round, ONE distributed job scores every remaining candidate
    against the current selection and collects the top-`m` pool
    (TakeOrdered, pool rows carry their embeddings). The driver then
    runs a certified lazy greedy (the CELF trick) inside the pool:
    cached pool scores are UPPER bounds (the penalty only grows as
    selections accumulate, so MMR scores only decrease), so a popped
    candidate whose freshly recomputed score still tops every other
    upper bound — including the round-start m-th pool score, which
    bounds every non-pool candidate — is provably the global greedy
    pick. Accepting stops the moment that certificate fails; the next
    distributed round refreshes. Driver recomputation replicates the
    JVM bit-for-bit: same left-fold dot/norm order, same HALF_UP
    6-dp rounding (`F.round` on doubles goes through shortest-repr
    BigDecimal — `Decimal(repr(v))` is the Python twin).

    `stats`, when given, receives {"rounds": r, "jobs": r} — the
    round-trip count the batching exists to shrink (NOTES round-3
    item #9: mmr_select pays k driver round-trips)."""
    import heapq
    import math
    from decimal import ROUND_HALF_UP, Decimal

    def _r6(v: float) -> float:
        return float(Decimal(repr(v)).quantize(
            Decimal("0.000001"), rounding=ROUND_HALF_UP))

    def _pydot(a, b) -> float:
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    def _pynorm(a) -> float:
        acc = 0.0
        for x in a:
            acc = acc + x * x
        return math.sqrt(acc)

    if m is None:
        m = min(max(2 * k, 8), n_candidates)
    spark = embeddings.sparkSession
    e = embeddings.select(
        "vec_id", _as_double(F.col("embedding")).alias("emb"))
    vid_type = dict(e.dtypes)["vec_id"]
    qv = e.where(F.col("vec_id") == query_id) \
        .select(F.col("emb").alias("q_emb"))
    cand = (e.crossJoin(F.broadcast(qv))
            .where(F.col("vec_id") != query_id)
            .select("vec_id", "emb",
                    F.round(_dot(F.col("emb"), F.col("q_emb"))
                            / (_norm(F.col("emb"))
                               * _norm(F.col("q_emb"))), 6)
                    .alias("rel"))
            .orderBy(F.col("rel").desc(), "vec_id")
            .limit(n_candidates)).localCheckpoint()
    lam_c, inv_c = F.lit(lam), F.lit(1.0) - F.lit(lam)
    inv = 1.0 - lam
    selected: list[dict] = []
    rounds = 0
    while len(selected) < k:
        rounds += 1
        sel_ids = [s["vec_id"] for s in selected]
        remaining = (cand.where(~F.col("vec_id").isin(sel_ids))
                     if sel_ids else cand)
        if selected:
            sel_vecs = spark.createDataFrame(
                [(s["emb"],) for s in selected], "_semb array<double>")
            pen = (remaining.crossJoin(F.broadcast(sel_vecs))
                   .select("vec_id",
                           F.round(_dot(F.col("emb"), F.col("_semb"))
                                   / (_norm(F.col("emb"))
                                      * _norm(F.col("_semb"))), 6)
                           .alias("_sim"))
                   .groupBy("vec_id").agg(F.max("_sim").alias("_pen")))
            scored = (remaining.join(pen, on="vec_id")
                      .select("vec_id", "emb", "rel",
                              F.round(lam_c * F.col("rel")
                                      - inv_c * F.col("_pen"), 6)
                              .alias("score")))
        else:
            scored = remaining.select(
                "vec_id", "emb", "rel",
                F.round(lam_c * F.col("rel"), 6).alias("score"))
        pool = (scored.orderBy(F.col("score").desc(), "vec_id")
                .limit(m).collect())
        if not pool:
            break
        # every non-pool candidate's score is <= the m-th pool score
        # now, and can only shrink as this round accepts picks
        bound = pool[-1]["score"] if len(pool) == m else None
        heap = [(-r["score"], r["vec_id"], r["rel"], list(r["emb"]),
                 True) for r in pool]
        heapq.heapify(heap)
        accepted = 0
        while heap and len(selected) < k:
            negs, vid, rel, emb, fresh = heapq.heappop(heap)
            if not fresh:
                p = max(_r6(_pydot(emb, s["emb"])
                            / (_pynorm(emb) * _pynorm(s["emb"])))
                        for s in selected)
                sc = _r6(lam * rel - inv * p)
                heapq.heappush(heap, (-sc, vid, rel, emb, True))
                continue
            sc = -negs
            if bound is not None and accepted and sc <= bound:
                break  # a non-pool candidate could now tie or win
            selected.append({"vec_id": vid, "rel": rel, "score": sc,
                             "rank": len(selected) + 1, "emb": emb})
            accepted += 1
            heap = [(ns, nv, nr, ne, False)
                    for (ns, nv, nr, ne, _) in heap]
            heapq.heapify(heap)
    if stats is not None:
        stats["rounds"] = stats["jobs"] = rounds
    return spark.createDataFrame(
        [(s["rank"], s["vec_id"], s["rel"], s["score"])
         for s in selected],
        f"rank int, vec_id {vid_type}, rel double, score double")


def top_component(
    embs: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iters: int = 3,
    precision: int = 8,
) -> DataFrame:
    """Leading principal direction of the embedding cloud (uncentered
    Gram/covariance top eigenvector) by power iteration — the
    distributed-PCA building block (top-k = deflate and repeat).
    Returns (dim, weight), max-abs-normalized to [-1, 1].

    Determinism at every step: Gram entries are EXACT long sums of
    micro-unit component products (one division to double per entry);
    each iteration's matrix-vector products round to integer
    nano-units BEFORE the per-dim sum (a float Σ over d terms would be
    order-dependent), and normalization divides exact longs by their
    exact max-abs. Start vector all-ones, so the eigen-sign is pinned.
    Plan: the d² Gram build is ONE pair self-join on the row id +
    map-side-combined (i, j) aggregate — the corpus is read once and
    never shuffled except by row id; iterations run on the tiny d²
    frame. Overflow headroom: Σ(q_i·q_j) caps at (max|x|·1e6)²·rows;
    switch the Gram sums to decimal(38,0) beyond ~10^9 rows.
    """
    ex = (embs.select(F.col(id_col).alias("_id"),
                      F.posexplode(_as_double(F.col(vec_col))))
          .select("_id", F.col("pos").alias("_i"),
                  F.round(F.col("col") * 1e6).cast("long").alias("_q"))
          ).localCheckpoint()
    gram = (ex.select("_id", F.col("_i"), F.col("_q"))
            .join(ex.select("_id", F.col("_i").alias("_j"),
                            F.col("_q").alias("_p")), on="_id")
            .groupBy("_i", "_j")
            .agg(F.sum(F.col("_q") * F.col("_p")).alias("_s"))
            .select("_i", "_j",
                    (F.col("_s") / F.lit(1e12)).alias("_c"))
            ).localCheckpoint()
    v = gram.select(F.col("_i").alias("_d")).distinct() \
        .select("_d", F.lit(1.0).alias("_v"))
    for _ in range(iters):
        w = (gram.join(v.select(F.col("_d").alias("_j"), "_v"),
                       on="_j")
             .select("_i", F.round(F.col("_c") * F.col("_v") * 1e9)
                     .cast("long").alias("_t"))
             .groupBy("_i").agg(F.sum("_t").alias("_w")))
        mx = w.agg(F.max(F.abs(F.col("_w"))).alias("_mx"))
        v = (w.crossJoin(F.broadcast(mx))
             .select(F.col("_i").alias("_d"),
                     F.when(F.col("_mx") > 0,
                            F.round(F.col("_w") / F.col("_mx"),
                                    precision))
                     .otherwise(F.lit(0.0)).alias("_v"))
             ).localCheckpoint()
    return v.select(F.col("_d").cast("int").alias("dim"),
                    F.col("_v").alias("weight"))


def project_component(
    embs: DataFrame,
    component: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    ndigits: int = 6,
) -> DataFrame:
    """Project every vector onto a (dim, weight) direction — the
    1-D reduced feature for the top_component output (ordering docs
    along the dominant semantic axis). Returns (id, score).

    The per-vector dot product sums nano-unit-rounded component
    products (exact longs — the top_component iteration discipline),
    one division at the end. Plan: posexplode + broadcast of the
    d-row direction + one id-keyed map-side-combined aggregate.
    """
    # components are micro-unit-quantized exactly like the Gram build,
    # so the projection and the direction share one numeric universe
    ex = (embs.select(F.col(id_col).alias("_id"),
                      F.posexplode(_as_double(F.col(vec_col))))
          .select("_id", F.col("pos").alias("dim"),
                  (F.round(F.col("col") * 1e6) / F.lit(1e6))
                  .alias("_x")))
    return (ex.join(F.broadcast(component), on="dim")
            .select("_id", F.round(F.col("_x") * F.col("weight") * 1e9)
                    .cast("long").alias("_t"))
            .groupBy("_id")
            .agg(F.round(F.sum("_t") / 1e9, ndigits).alias("score"))
            .select(F.col("_id").alias(id_col), "score"))


def silhouette_simplified(embeddings: DataFrame,
                          every_k: int = 100) -> DataFrame:
    """Simplified (centroid-based) silhouette per cluster over the
    ivf_assign partition: for each point, a = cosine DISTANCE
    (1 - cos) to its own centroid, b = min distance to any OTHER
    centroid, s = (b - a) / max(a, b) (0 when max == 0, the
    degenerate identical-centroid case). Returns one row per cluster:
    (centroid_id, n, s_sum_micro, mean_s) — the sum is EXACT 1e6
    micro-unit longs of the 6dp-rounded s, so the per-cluster mean is
    engine-order-free; the full silhouette's O(n²) pair distances
    collapse to O(n·k) centroid distances (Hruschka et al.'s
    simplified variant — the only form that scales).

    Scale shape: identical to ivf_assign — one broadcast of k
    centroids against the embedding scan, one groupBy(centroid)
    aggregate; nothing corpus-sized shuffles except the k-row spine.
    """
    e = _spread(
        embeddings.select("vec_id",
                          _as_double(F.col("embedding")).alias("emb")))
    cents = (e.where(F.col("vec_id") % every_k == 0)
             .select(F.col("vec_id").alias("centroid_id"),
                     F.col("emb").alias("c_emb")))
    scored = (
        e.crossJoin(F.broadcast(cents))
        .select(
            "vec_id", "centroid_id",
            F.round(F.lit(1.0)
                    - F.round(_dot(F.col("emb"), F.col("c_emb"))
                              / (_norm(F.col("emb"))
                                 * _norm(F.col("c_emb"))), 6), 6)
            .alias("dist")))
    w = Window.partitionBy("vec_id").orderBy(
        F.col("dist").asc(), F.col("centroid_id"))
    ranked = scored.withColumn("rn", F.row_number().over(w))
    own = (ranked.where(F.col("rn") == 1)
           .select("vec_id", "centroid_id", F.col("dist").alias("a")))
    # b = nearest OTHER centroid = rank-2 distance (rank 1 is own:
    # the assignment argmin IS the silhouette's own-centroid distance)
    other = (ranked.where(F.col("rn") == 2)
             .select("vec_id", F.col("dist").alias("b")))
    s = (own.join(other, on="vec_id")
         .withColumn(
             "s",
             F.when(F.greatest("a", "b") == 0, F.lit(0.0))
             .otherwise(F.round((F.col("b") - F.col("a"))
                                / F.greatest("a", "b"), 6))))
    return (s.groupBy("centroid_id")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.round(F.col("s") * 1e6).cast("long"))
                 .cast("long").alias("s_sum_micro"))
            .withColumn("mean_s",
                        F.round(F.col("s_sum_micro") / 1e6
                                / F.col("n"), 6))
            .select("centroid_id", "n", "s_sum_micro", "mean_s"))
