"""sparql_update: the functional SPARQL UPDATE verbs (CLEAR,
INSERT/DELETE DATA, DELETE WHERE, DELETE/INSERT WHERE) compiled onto
anti-joins + unions."""

from __future__ import annotations

import pytest


@pytest.fixture()
def g(spark):
    rows = [
        ("e:a", "rdf:type", "c:Person"),
        ("e:b", "rdf:type", "c:Person"),
        ("e:c", "rdf:type", "c:Robot"),
        ("e:a", "p:name", "alice"),
        ("e:b", "p:name", "bob"),
        ("e:a", "p:knows", "e:b"),
    ]
    return spark.createDataFrame(
        rows, "subject string, predicate string, object string")


def _run(t, q):
    from mms_rdf_spark.sparql import sparql_update

    return sparql_update(t, q)


def _spo(df):
    return {(r.subject, r.predicate, r.object) for r in df.collect()}


def test_clear(g):
    assert _run(g, "CLEAR ALL").count() == 0
    assert _run(g, "clear silent graph <mms-graph:vocabulary>").count() == 0
    assert _run(g, "CLEAR").count() == 0


def test_insert_data_is_set_union(g):
    out = _run(g, """
        INSERT DATA {
          e:d rdf:type c:Person .
          e:a p:name alice .
        }""")
    spo = _spo(out)
    assert ("e:d", "rdf:type", "c:Person") in spo
    assert out.count() == 7  # the duplicate (e:a name alice) dropped


def test_delete_data(g):
    out = _run(g, "DELETE DATA { e:a p:knows e:b . }")
    assert ("e:a", "p:knows", "e:b") not in _spo(out)
    assert out.count() == 5


def test_delete_where_pattern_is_template(g):
    out = _run(g, "DELETE WHERE { ?s rdf:type c:Person . ?s p:name ?n . }")
    spo = _spo(out)
    # both the type AND name triples of matching subjects are gone
    assert ("e:a", "rdf:type", "c:Person") not in spo
    assert ("e:a", "p:name", "alice") not in spo
    # non-matching subjects untouched
    assert ("e:c", "rdf:type", "c:Robot") in spo
    assert ("e:a", "p:knows", "e:b") in spo


def test_delete_insert_where_rewrites(g):
    out = _run(g, """
        DELETE { ?s rdf:type c:Person . }
        INSERT { ?s rdf:type c:Human . ?s p:audited "yes" . }
        WHERE { ?s rdf:type c:Person . }""")
    spo = _spo(out)
    assert ("e:a", "rdf:type", "c:Human") in spo
    assert ("e:b", "p:audited", "yes") in spo
    assert not any(p == "rdf:type" and o == "c:Person" for _, p, o in spo)
    assert ("e:c", "rdf:type", "c:Robot") in spo


def test_insert_where_preserves_metadata_columns(spark):
    import pyspark.sql.functions as F

    base = spark.createDataFrame(
        [("e:a", "p:x", "1", True)],
        "subject string, predicate string, object string, "
        "object_is_iri boolean")
    out = _run(base, "INSERT { ?s p:y ?o . } WHERE { ?s p:x ?o . }")
    rows = {r.predicate: r for r in out.collect()}
    assert rows["p:x"].object_is_iri is True  # existing row untouched
    assert rows["p:y"].object_is_iri is None  # insert carries NULL meta


def test_where_evaluates_against_pre_update_graph(g):
    # swap: every Person becomes Robot AND every Robot becomes Person —
    # correct only if WHERE binds before any delete applies
    step = _run(g, """
        DELETE { ?s rdf:type c:Robot . }
        INSERT { ?s rdf:type c:Tin . }
        WHERE { ?s rdf:type c:Robot . }""")
    out = _run(step, """
        DELETE { ?s rdf:type c:Person . }
        INSERT { ?s rdf:type c:Robot . }
        WHERE { ?s rdf:type c:Person . }""")
    spo = _spo(out)
    assert ("e:a", "rdf:type", "c:Robot") in spo
    assert ("e:c", "rdf:type", "c:Tin") in spo


def test_ground_only_data_blocks(g):
    with pytest.raises(ValueError):
        _run(g, "INSERT DATA { ?s p:x e:b . }")
    with pytest.raises(ValueError):
        _run(g, "NOT AN UPDATE")
