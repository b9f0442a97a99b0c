"""Incremental n-gram novelty (streaming/novelty.py): two-wave render
equality with the batch operator, min-merge across waves (including a
LATER wave carrying an EARLIER doc_id), replay idempotence, wave-split
equivalence."""

from __future__ import annotations


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


ROWS_A = [
    (0, "a b c d"),        # introduces "a b c", "b c d"
    (1, "a b c e"),        # repeats "a b c", introduces "b c e"
    (5, "p q r s"),
]
ROWS_B = [
    (2, "a b c d"),        # exact dup of doc 0 -> novelty 0
    (3, "x y"),            # too short -> excluded
    (4, "p q r t"),        # "p q r" first seen at doc 4 < doc 5!
    (6, None),             # NULL text contributes nothing
]


def _batch(spark, rows):
    from mms_rdf_spark.operators.textstats import ngram_novelty

    rows = [(i, t) for i, t in rows if t is not None]
    return sorted((r.doc_id, r.n_grams, r.n_new, r.novelty) for r in
                  ngram_novelty(_docs(spark, rows), n=3).collect())


def _rendered(spark, store):
    from mms_rdf_spark.streaming.novelty import render_novelty

    return sorted((r.doc_id, r.n_grams, r.n_new, r.novelty) for r in
                  render_novelty(spark, store).collect())


def _run_wave(spark, docs_dir, store, ckpt):
    from mms_rdf_spark.streaming.novelty import incremental_novelty

    incremental_novelty(spark, docs_dir, store, ckpt).awaitTermination()


def test_two_wave_equals_batch_operator(spark, tmp_path):
    docs_dir = str(tmp_path / "docs")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")

    _docs(spark, ROWS_A).write.parquet(docs_dir)
    _run_wave(spark, docs_dir, store, ckpt)
    assert _rendered(spark, store) == _batch(spark, ROWS_A)

    _docs(spark, ROWS_B).write.mode("append").parquet(docs_dir)
    _run_wave(spark, docs_dir, store, ckpt)
    got = _rendered(spark, store)
    assert got == _batch(spark, ROWS_A + ROWS_B)
    # the exact duplicate scored 0 against the earlier wave
    assert (2, 2, 0, 0.0) in got
    # min-merge: "p q r" moved from doc 5 (wave A) to doc 4 (wave B),
    # so doc 5's novelty DROPPED retroactively — 2 grams, 1 new
    assert (5, 2, 1, 0.5) in got
    assert (4, 2, 2, 1.0) in got


def test_replay_is_noop_and_wave_split_equivalence(spark, tmp_path):
    from mms_rdf_spark.streaming import snapshot
    from mms_rdf_spark.streaming.novelty import novelty_batch

    store = str(tmp_path / "store")
    g, tg, s, ts = novelty_batch(spark, _docs(spark, ROWS_A), store)
    snapshot.commit(spark, store, 0,
                    {"grams": (g, tg), "docstats": (s, ts)})
    v0 = snapshot.current_version(store)
    snapshot.commit(spark, store, 0,
                    {"grams": (g, tg), "docstats": (s, ts)})
    assert snapshot.current_version(store) == v0  # replay no-op

    # one-shot vs two-wave stores hold identical logical contents
    one = str(tmp_path / "one")
    rows_b = [r for r in ROWS_B if r[1] is not None]
    g1, tg1, s1, ts1 = novelty_batch(
        spark, _docs(spark, ROWS_A + rows_b), one)
    snapshot.commit(spark, one, 0,
                    {"grams": (g1, tg1), "docstats": (s1, ts1)})
    g2, tg2, s2, ts2 = novelty_batch(spark, _docs(spark, rows_b), store)
    snapshot.commit(spark, store, 1,
                    {"grams": (g2, tg2), "docstats": (s2, ts2)})

    def full(root):
        gr = snapshot.read_table(spark, root, "grams")
        st = snapshot.read_table(spark, root, "docstats")
        return ({(r.gram, r.first_doc) for r in gr.collect()},
                {(r.doc_id, r.n_grams) for r in st.collect()})

    assert full(one) == full(store)
