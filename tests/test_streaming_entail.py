"""Incremental RDFS entailment (streaming/entail.py): two-wave parity
with the batch operator, exactly-once emission when the same inference
is derivable in both waves, late assertion of an already-emitted
inference, and replay idempotence."""

from __future__ import annotations

import pyspark.sql.functions as F

TBOX = [
    ("c:Dog", "rdfs:subClassOf", "c:Animal"),
    ("c:Animal", "rdfs:subClassOf", "c:Thing"),
    ("p:hasOwner", "rdfs:domain", "c:Dog"),
    ("p:hasOwner", "rdfs:range", "c:Person"),
    ("p:hasGuardian", "rdfs:subPropertyOf", "p:hasOwner"),
]


def _df(spark, rows, schema="subject string, predicate string, "
                           "object string"):
    return spark.createDataFrame(rows, schema)


def _batch(spark, facts):
    from mms_rdf_spark.operators.materialize import rdfs_entailment

    out = rdfs_entailment(_df(spark, facts), _df(spark, TBOX))
    return {(r.subject, r.predicate, r.object) for r in out.collect()}


WAVE_A = [("e:rex", "p:hasGuardian", "e:ann"),
          ("e:rex", "rdf:type", "c:Dog")]
WAVE_B = [("e:fido", "p:hasOwner", "e:bob"),
          ("e:rex", "rdf:type", "c:Dog"),          # duplicate fact
          ("e:rex", "rdf:type", "c:Animal")]       # asserts an
                                                   # already-EMITTED inference


def test_two_wave_parity_and_late_assertion(spark, tmp_path):
    from mms_rdf_spark.streaming.entail import (
        incremental_entailment, inferred_view)

    facts_dir = str(tmp_path / "facts")
    store = str(tmp_path / "store")
    emit_dir = str(tmp_path / "emit")
    tbox = _df(spark, TBOX)

    _df(spark, WAVE_A).write.parquet(facts_dir)
    incremental_entailment(spark, facts_dir, tbox, store, emit_dir,
                           str(tmp_path / "ck")).awaitTermination()
    v1 = {(r.subject, r.predicate, r.object) for r in
          inferred_view(spark, store).collect()}
    assert v1 == _batch(spark, WAVE_A)
    # the chain fired: guardian -> owner, domain -> Dog type (already
    # asserted), subclass -> Animal + Thing
    assert ("e:rex", "rdf:type", "c:Animal") in v1

    _df(spark, WAVE_B).write.mode("append").parquet(facts_dir)
    incremental_entailment(spark, facts_dir, tbox, store, emit_dir,
                           str(tmp_path / "ck")).awaitTermination()
    v2 = {(r.subject, r.predicate, r.object) for r in
          inferred_view(spark, store).collect()}
    # row-identical to the batch operator on the union — including the
    # EXCLUSION of (rex type Animal), now asserted in wave B
    assert v2 == _batch(spark, WAVE_A + WAVE_B)
    assert ("e:rex", "rdf:type", "c:Animal") not in v2
    assert ("e:fido", "rdf:type", "c:Dog") in v2


def test_exactly_once_emission_across_waves(spark, tmp_path):
    from mms_rdf_spark.streaming.entail import incremental_entailment

    facts_dir = str(tmp_path / "facts")
    store = str(tmp_path / "store")
    emit_dir = str(tmp_path / "emit")
    tbox = _df(spark, TBOX)
    # the SAME inference (ann owns rex -> ... ) derivable in both
    # waves via the duplicated guardian fact
    _df(spark, WAVE_A).write.parquet(facts_dir)
    incremental_entailment(spark, facts_dir, tbox, store, emit_dir,
                           str(tmp_path / "ck")).awaitTermination()
    _df(spark, WAVE_A).write.mode("append").parquet(facts_dir)
    incremental_entailment(spark, facts_dir, tbox, store, emit_dir,
                           str(tmp_path / "ck")).awaitTermination()
    emitted = [(r.subject, r.predicate, r.object) for r in
               spark.read.option("basePath", emit_dir)
               .parquet(emit_dir).collect()]
    assert len(emitted) == len(set(emitted))  # no re-emission


def test_replay_is_noop(spark, tmp_path):
    from mms_rdf_spark.streaming import snapshot
    from mms_rdf_spark.streaming.entail import incremental_entailment

    facts_dir = str(tmp_path / "facts")
    store = str(tmp_path / "store")
    emit_dir = str(tmp_path / "emit")
    tbox = _df(spark, TBOX)
    _df(spark, WAVE_A).write.parquet(facts_dir)
    incremental_entailment(spark, facts_dir, tbox, store, emit_dir,
                           str(tmp_path / "c1")).awaitTermination()
    v1 = snapshot.current_version(store)
    incremental_entailment(spark, facts_dir, tbox, store, emit_dir,
                           str(tmp_path / "c2")).awaitTermination()
    assert snapshot.current_version(store) == v1
