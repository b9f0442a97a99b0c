"""Named-graph (quads) support: GRAPH blocks in sparql_select and the
graph-aware CLEAR verbs in sparql_update.

Reference parity: the reference drives per-project named graphs — its
clear verb is literally `clear silent graph <mms-graph:X>`
(/root/reference/src/action/clear.js:11-12) and its Neptune loader
takes namedGraphUri (update-neptune.js:85,108). The quads model here
is the triples frame plus a `graph` column; patterns outside GRAPH
match every row (union default graph)."""

from __future__ import annotations

import pytest


@pytest.fixture()
def quads(spark):
    rows = [
        ("e:a", "rdf:type", "c:Person", "g:proj1"),
        ("e:b", "rdf:type", "c:Person", "g:proj2"),
        ("e:a", "p:name", "alice", "g:proj1"),
        ("e:b", "p:name", "bob", "g:proj2"),
        ("e:c", "rdf:type", "c:Robot", None),  # default graph
    ]
    return spark.createDataFrame(
        rows,
        "subject string, predicate string, object string, graph string")


def _run(t, q):
    from mms_rdf_spark.sparql import sparql_select

    return sparql_select(t, q)


def test_graph_constant_scopes_patterns(quads):
    out = _run(quads, """
        SELECT ?s WHERE { GRAPH g:proj1 { ?s rdf:type c:Person . } }
    """).collect()
    assert [r.s for r in out] == ["e:a"]
    out2 = _run(quads, """
        SELECT ?s WHERE { GRAPH <g:proj2> { ?s rdf:type c:Person . } }
    """).collect()
    assert [r.s for r in out2] == ["e:b"]


def test_graph_variable_binds_names(quads):
    out = _run(quads, """
        SELECT ?g ?s WHERE { GRAPH ?g { ?s rdf:type c:Person . } }
        ORDER BY ?g""").collect()
    assert [(r.g, r.s) for r in out] == [("g:proj1", "e:a"),
                                        ("g:proj2", "e:b")]


def test_graph_block_joins_outer_patterns(quads):
    # conjunctive with the default-graph-union pattern outside
    out = _run(quads, """
        SELECT ?s ?n WHERE {
          ?s p:name ?n .
          GRAPH g:proj1 { ?s rdf:type c:Person . }
        }""").collect()
    assert [(r.s, r.n) for r in out] == [("e:a", "alice")]


def test_default_graph_is_union(quads):
    out = _run(quads, "SELECT ?s WHERE { ?s rdf:type ?t . }").collect()
    assert sorted(r.s for r in out) == ["e:a", "e:b", "e:c"]


def test_graph_requires_quads_column(spark):
    t = spark.createDataFrame(
        [("e:a", "rdf:type", "c:P")],
        "subject string, predicate string, object string")
    with pytest.raises(ValueError, match="graph"):
        _run(t, "SELECT ?s WHERE { GRAPH g:x { ?s rdf:type ?t . } }")


def test_clear_graph_removes_only_that_graph(quads):
    from mms_rdf_spark.sparql import sparql_update

    # the reference's verbatim verb shape (clear.js:12)
    out = sparql_update(quads, "clear silent graph <g:proj1>")
    assert sorted((r.subject, r.graph) for r in out.collect()) == [
        ("e:b", "g:proj2"), ("e:b", "g:proj2"), ("e:c", None)]


def test_clear_default_and_named(quads):
    from mms_rdf_spark.sparql import sparql_update

    dflt = sparql_update(quads, "CLEAR DEFAULT")
    assert all(r.graph is not None for r in dflt.collect())
    named = sparql_update(quads, "CLEAR NAMED")
    assert [r.graph for r in named.collect()] == [None]
    everything = sparql_update(quads, "CLEAR ALL")
    assert everything.count() == 0


def test_clear_graph_on_plain_triples_clears_all(spark):
    from mms_rdf_spark.sparql import sparql_update

    t = spark.createDataFrame(
        [("e:a", "rdf:type", "c:P")],
        "subject string, predicate string, object string")
    assert sparql_update(t, "clear silent graph <g:x>").count() == 0
