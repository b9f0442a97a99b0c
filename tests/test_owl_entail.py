"""OWL property-rule entailment (prp-inv / prp-symp / prp-trp): the
three-step predicate-level-rewrite + tagged-closure chain equals a
brute-force rule-engine fixpoint on adversarial TBoxes (inverse chains,
inverse+symmetric interaction, transitive on only one side of an
inverse pair, self-inverse)."""

from __future__ import annotations

import pyspark.sql.functions as F

from mms_rdf_spark.operators.materialize import owl_property_entailment


def _fixpoint(facts, inv_pairs, sym_preds, trans_preds):
    """Naive rule engine: apply all three rules until no new triple."""
    inv = set()
    for p, q in inv_pairs:
        inv.add((p, q))
        inv.add((q, p))
    w = set(facts)
    while True:
        new = set()
        for s, p, o in w:
            for a, b in inv:
                if p == a:
                    new.add((o, b, s))
            if p in sym_preds:
                new.add((o, p, s))
        for p in trans_preds:
            adj = [(s, o) for s, pp, o in w if pp == p]
            out = {s for s, _ in adj}
            nxt = {}
            for s, o in adj:
                nxt.setdefault(s, set()).add(o)
            for s in out:
                for o in list(nxt.get(s, ())):
                    for o2 in nxt.get(o, ()):
                        new.add((s, p, o2))
        if new <= w:
            return w - set(facts)
        w |= new


def _run(spark, facts, tbox_rows):
    fdf = spark.createDataFrame(
        list(facts), "subject string, predicate string, object string")
    tdf = spark.createDataFrame(
        tbox_rows, "subject string, predicate string, object string")
    out = owl_property_entailment(fdf, tdf)
    return {(r.subject, r.predicate, r.object) for r in out.collect()}


SYM = ("rdf:type", "owl:SymmetricProperty")
TRN = ("rdf:type", "owl:TransitiveProperty")


def test_transitive_chain(spark):
    facts = [(f"n{i}", "next", f"n{i+1}") for i in range(5)]
    tbox = [("next", *TRN)]
    got = _run(spark, facts, tbox)
    assert got == _fixpoint(facts, [], set(), {"next"})
    assert ("n0", "next", "n5") in got and len(got) == 10


def test_inverse_of_transitive(spark):
    # prev inverseOf next, only next transitive: prev gets the full
    # TRANSPOSED closure (the post-closure R-expansion step)
    facts = [(f"n{i}", "next", f"n{i+1}") for i in range(4)]
    tbox = [("next", *TRN), ("prev", "owl:inverseOf", "next")]
    got = _run(spark, facts, tbox)
    assert got == _fixpoint(facts, [("prev", "next")], set(), {"next"})
    assert ("n4", "prev", "n0") in got


def test_symmetric_plus_transitive_is_component_closure(spark):
    # sym + trans => every ordered pair within a connected component
    facts = [("a", "rel", "b"), ("b", "rel", "c"), ("x", "rel", "y")]
    tbox = [("rel", *SYM), ("rel", *TRN)]
    got = _run(spark, facts, tbox)
    assert got == _fixpoint(facts, [], {"rel"}, {"rel"})
    assert ("c", "rel", "a") in got and ("a", "rel", "a") in got
    assert not any(s in "xy" and o in "abc" for s, _, o in got)


def test_inverse_chain_and_self_inverse(spark):
    # p inv q, q inv r: p and r end up equal-oriented; s inv s = sym
    facts = [("a", "p", "b"), ("c", "s", "d")]
    tbox = [("p", "owl:inverseOf", "q"), ("q", "owl:inverseOf", "r"),
            ("s", "owl:inverseOf", "s")]
    got = _run(spark, facts, tbox)
    assert got == _fixpoint(
        facts, [("p", "q"), ("q", "r"), ("s", "s")], set(), set())
    assert ("a", "r", "b") in got       # non-flip pred rename via chain
    assert ("b", "q", "a") in got
    assert ("d", "s", "c") in got       # self-inverse behaves symmetric
    assert ("b", "p", "a") not in got   # p itself is NOT symmetric


def test_inverse_pair_where_symmetric_partner_backfeeds(spark):
    # q sym + q inv p: E_p = E_q = undirected; p also trans => closure
    # over the undirected component even though q is never asserted
    facts = [("a", "p", "b"), ("b", "p", "c")]
    tbox = [("q", *SYM), ("q", "owl:inverseOf", "p"), ("p", *TRN)]
    got = _run(spark, facts, tbox)
    assert got == _fixpoint(facts, [("q", "p")], {"q"}, {"p"})
    assert ("c", "p", "a") in got and ("a", "q", "c") in got


def test_literal_objects_excluded(spark):
    fdf = spark.createDataFrame(
        [("a", "rel", "b", True), ("a", "rel", "lit", False)],
        "subject string, predicate string, object string, "
        "object_is_iri boolean")
    tdf = spark.createDataFrame([("rel", *SYM)],
                                "subject string, predicate string, "
                                "object string")
    got = {(r.subject, r.predicate, r.object)
           for r in owl_property_entailment(fdf, tdf).collect()}
    assert got == {("b", "rel", "a")}


def test_inert_predicates_untouched_and_empty(spark):
    facts = [("a", "other", "b")]
    got = _run(spark, facts, [("next", *TRN)])
    assert got == set()
    fdf = spark.createDataFrame([],
                                "subject string, predicate string, "
                                "object string")
    tdf = spark.createDataFrame([("next", *TRN)],
                                "subject string, predicate string, "
                                "object string")
    assert owl_property_entailment(fdf, tdf).count() == 0


def test_randomized_against_fixpoint(spark):
    import random
    rng = random.Random(99)
    preds = ["p0", "p1", "p2", "p3"]
    for trial in range(4):
        facts = {(f"n{rng.randrange(7)}", rng.choice(preds),
                  f"n{rng.randrange(7)}") for _ in range(12)}
        inv, sym, trn, tbox = [], set(), set(), []
        if rng.random() < 0.8:
            a, b = rng.sample(preds, 2)
            inv.append((a, b))
            tbox.append((a, "owl:inverseOf", b))
        if rng.random() < 0.8:
            s = rng.choice(preds)
            sym.add(s)
            tbox.append((s, *SYM))
        for _ in range(2):
            if rng.random() < 0.8:
                t = rng.choice(preds)
                trn.add(t)
                tbox.append((t, *TRN))
        got = _run(spark, sorted(facts), tbox)
        want = _fixpoint(sorted(facts), inv, sym, trn)
        assert got == want, (trial, tbox, got ^ want)
