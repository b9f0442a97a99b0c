from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from mms_rdf_spark.operators.trajectory import (
    context_budget,
    context_overflow,
    conversation_dedup,
    conversation_digests,
    mixture_rebalance,
    preference_pairs,
    sft_context_windows,
    tool_call_loops,
)


def _turns(spark, rows):
    return spark.createDataFrame(
        [Row(conv_id=c, turn_idx=i, role=r, text=t, tool=tool)
         for (c, i, r, t, tool) in rows],
        schema="conv_id string, turn_idx int, role string, "
               "text string, tool string")


@pytest.fixture(scope="module")
def loop_turns(spark):
    # conv A: tool x at turns 1,2,3 (run of 3), tool y at 5 (run of 1),
    # tool x again at 7,8 (run of 2 — a NEW island after the gap).
    # conv B: no tools at all.
    rows = [
        ("A", 0, "user", "q", None),
        ("A", 1, "tool", "r1", "x"),
        ("A", 2, "tool", "r2", "x"),
        ("A", 3, "tool", "r3", "x"),
        ("A", 4, "assistant", "a", None),
        ("A", 5, "tool", "r4", "y"),
        ("A", 6, "user", "q2", None),
        ("A", 7, "tool", "r5", "x"),
        ("A", 8, "tool", "r6", "x"),
        ("B", 0, "user", "hi", None),
        ("B", 1, "assistant", "yo", None),
    ]
    return _turns(spark, rows)


def test_tool_loops_islands(spark, loop_turns):
    got = {(r.conv_id, r.tool, r.run_start, r.run_len)
           for r in tool_call_loops(loop_turns, min_run=2).collect()}
    assert got == {("A", "x", 1, 3), ("A", "x", 7, 2)}
    # min_run=1 also surfaces the singleton y run
    got1 = {(r.tool, r.run_start, r.run_len)
            for r in tool_call_loops(loop_turns, min_run=1).collect()}
    assert ("y", 5, 1) in got1 and len(got1) == 3


def test_tool_loops_single_exchange(spark, loop_turns):
    plan = tool_call_loops(loop_turns)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1


def test_context_budget_and_overflow(spark):
    rows = [
        ("C", 0, "user", "a b c", None),        # 3 toks, cum 3
        ("C", 1, "assistant", "d e", None),     # 2 toks, cum 5
        ("C", 2, "user", "f g h i", None),      # 4 toks, cum 9 > 8
        ("D", 0, "user", "x", None),            # fits
    ]
    t = _turns(spark, rows)
    cb = {(r.conv_id, r.turn_idx): (r.turn_tokens, r.cum_tokens, r.over_budget)
          for r in context_budget(t, budget=8).collect()}
    assert cb[("C", 0)] == (3, 3, 0)
    assert cb[("C", 2)] == (4, 9, 1)
    ov = {r.conv_id: (r.overflow_turn, r.total_tokens, r.n_turns)
          for r in context_overflow(t, budget=8).collect()}
    assert ov["C"] == (2, 9, 3)
    assert ov["D"] == (None, 1, 1)


def test_sft_windows_bounded_history(spark):
    rows = [
        ("E", 0, "assistant", "opening", None),   # empty context
        ("E", 1, "user", "u1", None),
        ("E", 2, "user", "u2", None),
        ("E", 3, "user", "u3", None),
        ("E", 4, "assistant", "ans", None),       # k=2 → only u2,u3
    ]
    got = {r.turn_idx: (r.context, r.target)
           for r in sft_context_windows(_turns(spark, rows), k=2).collect()}
    assert got[0] == ("", "opening")
    assert got[4] == ("user: u2\nuser: u3", "ans")
    assert set(got) == {0, 4}  # only assistant turns emit examples


def test_conversation_dedup_and_digest_stability(spark):
    base = [(i, "user" if i % 2 == 0 else "assistant", f"t{i}", None)
            for i in range(6)]
    rows = ([("K1", i, r, t, tool) for (i, r, t, tool) in base]
            + [("K2", i, r, t, tool) for (i, r, t, tool) in base]   # dup
            + [("K3", i, r, t + "!", tool) for (i, r, t, tool) in base])
    t = _turns(spark, rows)
    d = conversation_dedup(t)
    rows_out = {r.keep_conv: (r.n_convs, r.n_turns) for r in d.collect()}
    assert rows_out == {"K1": (2, 6), "K3": (1, 6)}
    # digest is repartition-stable (W1 rule)
    d1 = {r.conv_id: r.digest
          for r in conversation_digests(t).collect()}
    d2 = {r.conv_id: r.digest
          for r in conversation_digests(t.repartition(7)).collect()}
    assert d1 == d2 and d1["K1"] == d1["K2"] != d1["K3"]


def test_preference_pairs_margin(spark):
    docs = spark.createDataFrame([
        # group (s1, en): doc 1 clean text (high score), doc 2 shouty
        Row(doc_id=1, text="the cat and the dog sat in a field",
            lang="en", source="s1"),
        Row(doc_id=2, text="BUY!!! NOW!!! $$$ WOW!!!", lang="en",
            source="s1"),
        Row(doc_id=3, text="middle of the road text here", lang="en",
            source="s1"),
        # singleton group → no pair
        Row(doc_id=4, text="alone", lang="en", source="s2"),
    ])
    out = preference_pairs(docs).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.source, r.lang) == ("s1", "en")
    assert r.chosen_doc == 1 and r.rejected_doc == 2
    assert r.margin > 0 and r.n_docs == 3


def test_preference_pairs_tiebreak_is_deterministic(spark):
    # identical scores → doc_id breaks the tie: max doc_id wins chosen,
    # min doc_id is rejected (zero-padded key ordering).
    docs = spark.createDataFrame([
        Row(doc_id=i, text="same text twin", lang="en", source="s")
        for i in (10, 7, 30)])
    r = preference_pairs(docs).collect()[0]
    assert r.chosen_doc == 30 and r.rejected_doc == 7 and r.margin == 0.0


def test_mixture_rebalance_fractions(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=i, text="x", lang="en",
             source="big" if i < 900 else "small")
         for i in range(1000)])
    out = mixture_rebalance(docs, {"big": 1.0, "small": 1.0})
    counts = {r.source: r.n for r in
              out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    # target per domain = 500; small (100 docs) keeps all, big samples
    # ~500/900 of its 900 docs.
    assert counts["small"] == 100
    assert 400 < counts["big"] < 600
    # deterministic: same input → identical selection
    a = {r.doc_id for r in out.collect()}
    b = {r.doc_id for r in
         mixture_rebalance(docs, {"big": 1.0, "small": 1.0}).collect()}
    assert a == b


def test_mixture_rebalance_unlisted_domain_dropped(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=i, text="x", lang="en", source=s)
         for i, s in enumerate(["keep"] * 10 + ["drop"] * 10)])
    out = mixture_rebalance(docs, {"keep": 1.0})
    assert {r.source for r in out.collect()} == {"keep"}


def test_mixture_rebalance_broadcasts_fraction_table(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=i, text="x", lang="en", source="s") for i in range(50)])
    plan = (mixture_rebalance(docs, {"s": 0.5})
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan


def test_protocol_violations_rules(spark):
    from mms_rdf_spark.operators.trajectory import protocol_violations

    rows = [
        ("c1", 0, "user", "hi", None),
        ("c1", 1, "assistant", "yo", None),      # clean
        ("c1", 2, "assistant", "again", None),   # repeat + clean-prev
        ("c1", 3, "tool", "x", "t"),             # tool after assistant: ok
        ("c2", 0, "assistant", "cold open", None),  # orphan_assistant
        ("c2", 1, "user", "q", None),
        ("c2", 2, "tool", "x", "t"),             # orphan_tool (after user)
        ("c3", 0, None, "a", None),
        ("c3", 1, None, "b", None),              # repeat (null-safe)
    ]
    turns = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string")
    out = {(r.conv_id, r.turn_idx, r.violation)
           for r in protocol_violations(turns).collect()}
    assert ("c1", 2, "repeat") in out
    assert ("c2", 0, "orphan_assistant") in out
    assert ("c2", 2, "orphan_tool") in out
    assert ("c3", 1, "repeat") in out
    # first turns are never 'repeat', clean turns absent
    assert not any(v == "repeat" and t == 0 for _, t, v in out)
    assert ("c1", 1, "orphan_assistant") not in out
    assert ("c1", 3, "orphan_tool") not in out


def test_preference_length_bias_detects_length_signal(spark):
    from mms_rdf_spark.operators.trajectory import preference_length_bias

    # quality tracks stopword density; make longer docs ALSO denser ->
    # margin correlates positively with length delta
    rows = []
    for g in range(8):
        short = "xx yy zz"
        # stopword density AND length both grow with g -> margins vary
        long = "the " * (g + 2) + "xq"
        rows.append((2 * g, short, "en", f"s{g}", len(short)))
        rows.append((2 * g + 1, long, "en", f"s{g}", len(long)))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
    out = preference_length_bias(docs).collect()[0]
    assert out.n_pairs == 8
    assert out.r is not None and out.r > 0.5


def test_preference_length_bias_zero_variance_is_null(spark):
    from mms_rdf_spark.operators.trajectory import preference_length_bias

    # identical margins and length deltas in every group -> zero
    # variance in x -> r must be NULL, never a division blowup
    rows = []
    for g in range(3):
        rows.append((2 * g, "xx yy", "en", f"s{g}", 5))
        rows.append((2 * g + 1, "the the", "en", f"s{g}", 7))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
    out = preference_length_bias(docs).collect()[0]
    assert out.n_pairs == 3 and out.r is None


def test_truncate_to_budget_head_tail(spark):
    from mms_rdf_spark.operators.trajectory import truncate_to_budget

    # conv "big": 6 turns x 10 tokens = 60 total, budget 30 ->
    # head keeps turns 0-1 (cum 10,20 <= 20), tail keeps 4-5
    # (reverse cum 10,20 <= 20), middle 2-3 dropped
    word10 = " ".join(["w"] * 10)
    rows = [("big", i, "user", word10, None) for i in range(6)]
    # conv "small": fits entirely
    rows += [("small", 0, "user", "a b", None),
             ("small", 1, "assistant", "c", None)]
    turns = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string")
    out = {(r.conv_id, r.turn_idx): r.kept_by
           for r in truncate_to_budget(turns, budget=30, head=20,
                                       tail=20).collect()}
    assert out[("big", 0)] == "head" and out[("big", 1)] == "head"
    assert out[("big", 4)] == "tail" and out[("big", 5)] == "tail"
    assert ("big", 2) not in out and ("big", 3) not in out
    assert out[("small", 0)] == "all" and out[("small", 1)] == "all"


def test_truncate_head_wins_overlap(spark):
    from mms_rdf_spark.operators.trajectory import truncate_to_budget

    # 3 x 10 tokens = 30 > budget 20; head 20 covers turns 0-1,
    # tail 20 covers 1-2: turn 1 qualifies for both -> 'head', no dup
    word10 = " ".join(["w"] * 10)
    turns = spark.createDataFrame(
        [("c", i, "user", word10, None) for i in range(3)],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string")
    rows = truncate_to_budget(turns, budget=20, head=20,
                              tail=20).collect()
    assert len(rows) == 3  # each turn exactly once
    by = {r.turn_idx: r.kept_by for r in rows}
    assert by == {0: "head", 1: "head", 2: "tail"}


def test_truncate_single_exchange(spark):
    from mms_rdf_spark.operators.trajectory import truncate_to_budget

    turns = spark.createDataFrame(
        [("c", i, "user", "w w w", None) for i in range(4)],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string")
    plan = truncate_to_budget(turns)._jdf.queryExecution() \
        .executedPlan().toString()
    # forward, reverse, and total windows all ride ONE conv_id exchange
    assert plan.count("Exchange") == 1, plan


def test_conversations_as_docs_neardup(spark):
    from mms_rdf_spark.operators.dedup import lsh_candidate_pairs
    from mms_rdf_spark.operators.trajectory import conversations_as_docs

    base = [(i, "user", f"alpha beta gamma delta t{i}", None)
            for i in range(5)]
    rows = ([("N1", i, r, t, tool) for (i, r, t, tool) in base]
            # N2: same conversation, one token changed -> near-dup
            + [("N2", i, r, t if i != 4 else t + " extra", tool)
               for (i, r, t, tool) in base]
            # N3: unrelated content
            + [("N3", i, "user", f"zz qq ww ee rr uu vv x{i}", None)
               for i in range(5)])
    t = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string")
    docs = conversations_as_docs(t)
    # adapter renders deterministically under repartitioning
    a = {r.doc_id: r.text for r in docs.collect()}
    b = {r.doc_id: r.text
         for r in conversations_as_docs(t.repartition(7)).collect()}
    assert a == b and a["N1"].startswith("alpha beta gamma delta t0")
    pairs = {(r.a_id, r.b_id) for r in lsh_candidate_pairs(docs).collect()}
    assert ("N1", "N2") in pairs
    assert not any("N3" in p for p in pairs)
