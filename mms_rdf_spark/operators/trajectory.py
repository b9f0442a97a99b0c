"""Agent-trajectory operators over multi-turn transcript tables.

The graft payload is conversation/agent transcripts (conv_id, turn_idx,
role, text, tool, ts) — this module holds the trajectory-shaped
curation ops an LLM training pipeline runs on that table BEFORE any
per-document text op applies: detecting degenerate tool-call loops,
accounting context-window token budgets per conversation, cutting SFT
(context, target) training examples with a bounded history window,
deduplicating whole conversations (the transcript-granular twin of
dedup.exact_duplicates), constructing DPO/RLHF preference pairs, and
rebalancing a corpus to a target domain mixture.

Scale shape, per op (the 100-TB contract):
- every per-conversation op is ONE hash exchange on conv_id (window or
  groupBy); conversations are the natural partition unit and the
  synthetic corpus' conv sizes are bounded (longest-conversation skew is
  the sessionize/extract story — AQE skew-split covers the residue);
- tool_call_loops groups by (conv_id, tool, island) ON TOP of the
  window's (conv_id, tool) partitioning — Spark satisfies the grouping
  from the existing exchange, so islands cost zero extra shuffles;
- preference_pairs / mixture_rebalance collapse the corpus to a
  per-group row (few groups) — the stats frame is broadcast back, the
  fact table is never shuffled (the skew.py two-phase shape);
- sft_context_windows keeps the history INSIDE a bounded window frame
  (k preceding rows), so state is O(k·turn) per task, never a
  conversation-sized collect.

Determinism recipes (NOTES.md): micro-unit long arithmetic for argmax
keys (zero-padded sort strings — the VARCHAR arg_min rule), chr(30) as
the conversation-digest separator (no control chars authored into
source), md5-prefix uniform hashing for sampling thresholds (the
packing.weighted_sample rule), and the shared dedup._tokens whitespace
semantics so token counts can never drift from dedup/decontamination.

Reference provenance: the reference pipeline has no trajectory ops (it
is a stream-plumbing triple factory, src/multi/triplify.js); this
module is part of the beyond-reference LLM-pipeline suite the brief
prescribes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from mms_rdf_spark.operators.dedup import _tokens

# conversation-digest separator: ASCII RS, built with chr() so no raw
# control char is ever authored into a source file (NOTES gotcha).
_SEP = chr(30)


# ------------------------------------------------------------ tool loops
def tool_call_loops(turns: DataFrame, min_run: int = 2) -> DataFrame:
    """Detect degenerate tool-call loops: maximal runs of CONSECUTIVE
    turns (adjacent turn_idx) in one conversation invoking the SAME
    tool, of length >= min_run. Classic gaps-and-islands: within
    (conv_id, tool), consecutive turn_idx values share the constant
    `turn_idx - row_number()`, so each maximal run is one island.

    One exchange total: the island window partitions by (conv_id, tool)
    and the follow-up groupBy keys are a superset of that partitioning,
    so Spark reuses the exchange. Output: (conv_id, tool, run_start,
    run_len), one row per loop.
    """
    w = Window.partitionBy("conv_id", "tool").orderBy("turn_idx")
    runs = (
        turns.where(F.col("tool").isNotNull())
        .withColumn("_island", F.col("turn_idx") - F.row_number().over(w))
        .groupBy("conv_id", "tool", "_island")
        .agg(F.min("turn_idx").alias("run_start"),
             F.count(F.lit(1)).cast("long").alias("run_len"))
        .where(F.col("run_len") >= min_run)
    )
    return runs.select("conv_id", "tool", "run_start", "run_len")


# -------------------------------------------------------- context budget
def context_budget(turns: DataFrame, budget: int = 64) -> DataFrame:
    """Per-turn context-window accounting: running token total over the
    conversation in stable turn order, plus an over-budget flag — the
    audit a long-context training-data pipeline runs to find where raw
    conversations overflow the model's window. Token semantics shared
    with dedup._tokens (whitespace, empties dropped) so counts agree
    with every other token-based measure in the repo.

    One window exchange on conv_id; the cumulative sum is a bounded
    running frame (unbounded preceding .. current row) — O(1) state per
    row, exact long arithmetic.
    """
    w = (Window.partitionBy("conv_id").orderBy("turn_idx")
         .rowsBetween(Window.unboundedPreceding, 0))
    toks = F.size(_tokens(F.coalesce(F.col("text"), F.lit("")))) \
        .cast("long")
    return turns.select(
        "conv_id", "turn_idx",
        toks.alias("turn_tokens"),
        F.sum(toks).over(w).alias("cum_tokens"),
    ).withColumn("over_budget",
                 (F.col("cum_tokens") > budget).cast("int"))


def context_overflow(turns: DataFrame, budget: int = 64) -> DataFrame:
    """First overflow point per conversation: the smallest turn_idx
    whose running token total exceeds `budget`, with the conversation's
    total tokens — the per-conversation truncation plan (everything
    from overflow_turn onward needs splitting / windowed packing).
    Conversations that fit are reported with overflow_turn = NULL.
    Piggybacks on context_budget's single exchange: the groupBy key
    (conv_id) matches the window partitioning, zero extra shuffles.
    """
    cb = context_budget(turns, budget)
    return (cb.groupBy("conv_id")
            .agg(F.min(F.when(F.col("over_budget") == 1,
                              F.col("turn_idx"))).alias("overflow_turn"),
                 F.max("cum_tokens").alias("total_tokens"),
                 F.count(F.lit(1)).cast("long").alias("n_turns")))


# --------------------------------------------------- SFT context windows
def sft_context_windows(turns: DataFrame, k: int = 3) -> DataFrame:
    """Cut SFT training examples from transcripts: for every assistant
    turn, (context, target) where context is the previous `k` turns
    rendered "role: text" joined by newlines and target is the
    assistant text. The bounded history frame (k preceding .. 1
    preceding) keeps per-task state at O(k) rows — never a whole
    conversation — and collect_list over an ORDERED window frame
    preserves frame order, so the rendering is deterministic.

    One exchange on conv_id. Empty history (the conversation-opening
    assistant turn) renders as '' (array_join of an empty array), and
    the oracle coalesces its NULL string_agg to match.
    """
    w = (Window.partitionBy("conv_id").orderBy("turn_idx")
         .rowsBetween(-k, -1))
    # explicit coalesce (not concat_ws null-skipping): a NULL role
    # renders as ': text' in BOTH engines — concat_ws would silently
    # drop the separator here while SQL's || would drop the whole line.
    line = F.concat(F.coalesce(F.col("role"), F.lit("")), F.lit(": "),
                    F.coalesce(F.col("text"), F.lit("")))
    return (
        turns.withColumn(
            "context", F.array_join(F.collect_list(line).over(w), "\n"))
        .where(F.col("role") == "assistant")
        .select("conv_id", "turn_idx", "context",
                F.col("text").alias("target"))
    )


# ------------------------------------------------- conversation dedup
def conversation_digests(turns: DataFrame) -> DataFrame:
    """Whole-conversation content digest: md5 over the turn stream
    ("role|text" joined by chr(30)) in stable turn order — the
    transcript-granular identity every conversation-level dedup keys
    on. sort_array over (turn_idx, role, text) structs makes the
    rendering order deterministic under any partitioning (the W1
    repartition-stability rule).

    One groupBy exchange on conv_id; per-conversation state is the
    turn list (bounded by the longest conversation — the same bound
    extract's conv window already carries).
    """
    cell = F.struct(F.col("turn_idx"), F.col("role"), F.col("text"))
    rendered = F.array_join(
        F.transform(F.sort_array(F.collect_list(cell)),
                    lambda s: F.concat(F.coalesce(s["role"], F.lit("")),
                                       F.lit("|"),
                                       F.coalesce(s["text"], F.lit("")))),
        _SEP)
    return (turns.groupBy("conv_id")
            .agg(F.md5(rendered).alias("digest"),
                 F.count(F.lit(1)).cast("long").alias("n_turns")))


def conversation_dedup(turns: DataFrame) -> DataFrame:
    """Conversation-level exact dedup: group identical conversations
    (same ordered role|text stream) and elect the minimum conv_id as
    keeper — dedup.exact_duplicates lifted from documents to
    transcripts. Output one row per distinct conversation content:
    (digest, keep_conv, n_convs, n_turns).

    Two exchanges total (conv_id digest agg, then digest agg) — both
    on high-cardinality uniform md5 keys, unskewable by construction.
    """
    d = conversation_digests(turns)
    return (d.groupBy("digest")
            .agg(F.min("conv_id").alias("keep_conv"),
                 F.count(F.lit(1)).cast("long").alias("n_convs"),
                 F.min("n_turns").alias("n_turns")))


# ------------------------------------------------------ preference pairs
def preference_pairs(docs: DataFrame,
                     group_cols: tuple[str, ...] = ("source", "lang"),
                     ) -> DataFrame:
    """DPO/RLHF preference-pair construction: within each prompt group
    (here the (source, lang) cell of the synthetic corpus), elect the
    highest-quality document as `chosen` and the lowest as `rejected`,
    with the quality margin — the pairwise-preference prep step of a
    reward-model / DPO data pipeline. Quality is the shared
    textstats.quality_score_expr, so preference ordering can never
    drift from the curation filter.

    Determinism: argmax/argmin via zero-padded VARCHAR sort keys over
    (score micro-units, doc_id) — the NOTES.md arg_min recipe, exact
    cross-engine. Scale: one map-side-combinable groupBy that collapses
    the corpus to a per-group row; no windows, no self-joins; groups
    with fewer than 2 docs are dropped (no pair exists).
    """
    from mms_rdf_spark.operators.textstats import quality_score_expr

    units = F.round(quality_score_expr(F.col("text")) * 1e6).cast("long")
    # sortable key: score then doc_id, both zero-padded; score offset
    # by 10^9 keeps negatives ordinal in the string domain.
    key = F.concat(
        F.lpad((units + F.lit(1_000_000_000)).cast("string"), 12, "0"),
        F.lpad(F.col("doc_id").cast("string"), 12, "0"))
    gcols = [F.col(c) for c in group_cols]
    return (
        docs.groupBy(*gcols)
        .agg(F.max_by("doc_id", key).alias("chosen_doc"),
             F.max(units).alias("_max_u"),
             F.min_by("doc_id", key).alias("rejected_doc"),
             F.min(units).alias("_min_u"),
             F.count(F.lit(1)).cast("long").alias("n_docs"))
        .where(F.col("n_docs") >= 2)
        .select(*group_cols, "chosen_doc", "rejected_doc",
                F.round((F.col("_max_u") - F.col("_min_u")) / 1e6, 6)
                .alias("margin"),
                "n_docs")
    )


# ---------------------------------------------------- mixture rebalance
def _u01(col: Column) -> Column:
    """Deterministic uniform [0,1) from md5's first 6 hex digits —
    the shared sampling-hash recipe (packing.weighted_sample)."""
    return (F.conv(F.substring(F.md5(col.cast("string")), 1, 6), 16, 10)
            .cast("long") / F.lit(float(16 ** 6)))


def mixture_rebalance(docs: DataFrame, weights: dict[str, float],
                      key_col: str = "source") -> DataFrame:
    """Rebalance a corpus to a target domain mixture (DoReMi-style
    static weights): given target weight per domain, downsample each
    domain to `total * w_d / Σw` documents via a deterministic
    per-document hash threshold. Domains absent from `weights` get
    weight 0 (dropped); domains whose target exceeds their count keep
    everything (fraction clamps at 1 — this op never upsamples).

    Scale shape: one tiny per-domain count aggregate (map-side
    combined) joined back as a BROADCAST fraction table — the corpus
    itself is scanned once and never shuffled; selection is a pure
    column filter on md5(doc_id).
    """
    wmap = F.create_map(
        *[x for k, v in weights.items() for x in (F.lit(k), F.lit(float(v)))])
    counts = (docs.groupBy(key_col)
              .agg(F.count(F.lit(1)).cast("long").alias("_n")))
    tot = counts.agg(F.sum("_n").alias("_tot"))
    frac = (counts.crossJoin(F.broadcast(tot))
            .select(key_col,
                    F.least(
                        F.lit(1.0),
                        F.col("_tot") * F.coalesce(wmap[F.col(key_col)],
                                                   F.lit(0.0))
                        / F.lit(float(sum(weights.values()) or 1.0))
                        / F.col("_n")).alias("_frac")))
    return (docs.join(F.broadcast(frac), on=key_col)
            .where(_u01(F.col("doc_id")) < F.col("_frac"))
            .select("doc_id", key_col))


def temperature_mixture(docs: DataFrame, alpha: float = 0.5,
                        budget: int = 1000,
                        key_col: str = "source") -> DataFrame:
    """Temperature-smoothed mixture sampling (multilingual-training
    style): domain sampling mass q_d ∝ n_d^alpha — alpha < 1 flattens
    the head, upweighting rare domains relative to their raw share —
    and each domain keeps min(1, q_d * budget / n_d) of its docs via
    the same deterministic md5 threshold as mixture_rebalance.

    Determinism: pow() outputs are re-gridded as exact 1e6 micro-unit
    longs BEFORE the normalizing sum (order-independent across
    engines); q_d and the keep fraction are single divisions of
    exact-long-derived doubles, rounded 9dp.

    Scale shape: identical to mixture_rebalance — one tiny per-domain
    aggregate, fraction table broadcast back, corpus scanned once
    unshuffled.
    """
    counts = (docs.groupBy(key_col)
              .agg(F.count(F.lit(1)).cast("long").alias("_n")))
    pw_u = F.round(F.pow(F.col("_n").cast("double"), F.lit(float(alpha)))
                   * 1e6).cast("long")
    powed = counts.select(key_col, "_n", pw_u.alias("_pu"))
    tot = powed.agg(F.sum("_pu").alias("_tu"))
    frac = (powed.crossJoin(F.broadcast(tot))
            .select(key_col,
                    F.least(
                        F.lit(1.0),
                        F.round(
                            F.round(F.col("_pu").cast("double")
                                    / F.col("_tu").cast("double"), 9)
                            * budget / F.col("_n"), 9)).alias("_frac")))
    return (docs.join(F.broadcast(frac), on=key_col)
            .where(_u01(F.col("doc_id")) < F.col("_frac"))
            .select("doc_id", key_col))


# --------------------------------------------------- protocol audit
def protocol_violations(turns: DataFrame) -> DataFrame:
    """Turn-taking protocol audit: flags turns that break the
    conversation grammar — 'repeat' (same role as the previous turn,
    null-safe), 'orphan_assistant' (assistant turn not preceded by a
    user or tool turn), 'orphan_tool' (tool turn not preceded by an
    assistant turn). A turn can carry several violations (one output
    row each). First turns have no predecessor: a leading assistant /
    tool turn is an orphan by definition.

    One window exchange on conv_id; the violation array is built as
    pure column logic and exploded (narrow)."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    prev = F.lag("role").over(w)
    # lag(role) is NULL both for "no previous turn" and "previous turn
    # had a NULL role" — existence comes from lag(turn_idx) instead
    has_prev = F.lag("turn_idx").over(w).isNotNull()
    vio = F.array_compact(F.array(
        F.when(has_prev & F.col("role").eqNullSafe(prev),
               F.lit("repeat")),
        F.when((F.col("role") == "assistant")
               & ~F.coalesce(prev.isin("user", "tool"), F.lit(False)),
               F.lit("orphan_assistant")),
        F.when((F.col("role") == "tool")
               & ~F.coalesce(prev == "assistant", F.lit(False)),
               F.lit("orphan_tool")),
    ))
    return (turns.select("conv_id", "turn_idx", "role",
                         prev.alias("prev_role"), vio.alias("_v"))
            .where(F.size("_v") > 0)
            .select("conv_id", "turn_idx", "role", "prev_role",
                    F.explode("_v").alias("violation")))


def preference_length_bias(
        docs: DataFrame,
        group_cols: tuple[str, ...] = ("source", "lang")) -> DataFrame:
    """Length-bias audit for DPO pairs: Pearson correlation between the
    preference margin and the chosen-minus-rejected length delta — the
    reward-hacking smell test (a strongly positive r means the
    'preferred' signal is just length). Computed from exact integer
    moment sums (margin is 6dp-gridded -> exact 1e6 micro-unit longs;
    lengths are exact), so the single-row result is order-independent
    and hash-checkable: (n_pairs, r) with r rounded 6dp, NULL when
    either variance is zero."""
    pairs = preference_pairs(docs, group_cols=group_cols)
    lens = docs.select("doc_id", F.col("n_chars").cast("long").alias("_len"))
    j = (pairs
         .join(lens.withColumnRenamed("doc_id", "chosen_doc")
               .withColumnRenamed("_len", "_lc"), "chosen_doc")
         .join(lens.withColumnRenamed("doc_id", "rejected_doc")
               .withColumnRenamed("_len", "_lr"), "rejected_doc")
         .select(F.round(F.col("margin") * 1e6).cast("long").alias("_x"),
                 (F.col("_lc") - F.col("_lr")).alias("_y")))
    m = j.agg(F.count(F.lit(1)).alias("n"),
              F.sum("_x").alias("sx"), F.sum("_y").alias("sy"),
              F.sum(F.col("_x") * F.col("_x")).alias("sxx"),
              F.sum(F.col("_y") * F.col("_y")).alias("syy"),
              F.sum(F.col("_x") * F.col("_y")).alias("sxy"))
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    cov = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    r = F.when((vx > 0) & (vy > 0),
               F.round(cov / F.sqrt(vx.cast("double"))
                       / F.sqrt(vy.cast("double")), 6))
    return m.select(F.col("n").alias("n_pairs"), r.alias("r"))


def truncate_to_budget(turns: DataFrame, budget: int = 64,
                       head: int = 32, tail: int = 24) -> DataFrame:
    """Head-tail truncation plan for over-budget conversations (the
    standard long-context recipe: keep the opening system/user framing
    and the latest turns, drop the middle): conversations whose total
    tokens fit `budget` keep every turn (kept_by='all'); otherwise a
    turn survives if its forward running total fits `head`
    (kept_by='head') or its REVERSE running total fits `tail`
    (kept_by='tail', head wins ties so no duplicates). Token semantics
    shared with dedup._tokens.

    One exchange: both running sums ride the same conv_id hash
    partitioning (forward and reverse orderings are two sorts over one
    exchange); output is the kept-turn plan (conv_id, turn_idx,
    turn_tokens, kept_by).
    """
    fwd = (Window.partitionBy("conv_id").orderBy("turn_idx")
           .rowsBetween(Window.unboundedPreceding, 0))
    rev = (Window.partitionBy("conv_id").orderBy(F.desc("turn_idx"))
           .rowsBetween(Window.unboundedPreceding, 0))
    toks = F.size(_tokens(F.coalesce(F.col("text"), F.lit("")))) \
        .cast("long")
    cum_f = F.sum(toks).over(fwd)
    cum_r = F.sum(toks).over(rev)
    total = F.sum(toks).over(Window.partitionBy("conv_id"))
    kept = (F.when(total <= budget, F.lit("all"))
            .when(cum_f <= head, F.lit("head"))
            .when(cum_r <= tail, F.lit("tail")))
    return (turns.select("conv_id", "turn_idx",
                         toks.alias("turn_tokens"), kept.alias("kept_by"))
            .where(F.col("kept_by").isNotNull()))


def conversations_as_docs(turns: DataFrame) -> DataFrame:
    """Adapter: collapse each conversation to ONE document row
    (doc_id = conv_id, text = turn texts in stable order joined by a
    space) so every document-granular operator — MinHash/LSH near-dup,
    quality scoring, decontamination — applies at conversation
    granularity unchanged. sort_array over (turn_idx, text) structs
    makes the rendering repartition-stable (the conversation_digests
    rule); one conv_id exchange."""
    return (turns
            .groupBy(F.col("conv_id").alias("doc_id"))
            .agg(F.concat_ws(
                " ",
                F.transform(
                    F.sort_array(F.collect_list(F.struct(
                        F.col("turn_idx"),
                        F.coalesce(F.col("text"), F.lit(""))
                        .alias("text")))),
                    lambda s: s["text"])).alias("text")))
