"""sparql_select: the SPARQL SELECT string front-end compiled onto
DataFrame joins."""

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
        ("e:c", "p:name", "c3po"),
        ("e:a", "p:age", "31"),
        ("e:b", "p:age", "9"),
        ("e:a", "p:knows", "e:b"),
    ]
    return spark.createDataFrame(
        rows, "subject string, predicate string, object string")


def _run(t, q):
    from mms_rdf_spark.sparql import sparql_select

    return sparql_select(t, q)


def test_bgp_join_and_projection(g):
    out = _run(g, """
        SELECT ?s ?n WHERE {
          ?s rdf:type c:Person .
          ?s p:name ?n .
        } ORDER BY ?s""").collect()
    assert [(r.s, r.n) for r in out] == [("e:a", "alice"), ("e:b", "bob")]


def test_optional_binds_null(g):
    out = {r.s: r.a for r in _run(g, """
        SELECT ?s ?a WHERE {
          ?s rdf:type c:Person .
          OPTIONAL { ?s p:age ?a . }
        }""").collect()}
    assert out == {"e:a": "31", "e:b": "9"}
    out2 = {r.s: r.a for r in _run(g, """
        SELECT ?s ?a WHERE {
          ?s p:name ?n .
          OPTIONAL { ?s p:age ?a . }
        }""").collect()}
    assert out2["e:c"] is None  # OPTIONAL miss -> NULL binding


def test_filters_compare_and_regex(g):
    out = _run(g, """
        SELECT ?s WHERE {
          ?s p:age ?a .
          FILTER (?a > 10)
        }""").collect()
    assert [r.s for r in out] == ["e:a"]  # numeric, not lexicographic
    out2 = _run(g, """
        SELECT ?n WHERE {
          ?s p:name ?n .
          FILTER regex(?n, "^[ab]")
        } ORDER BY ?n""").collect()
    assert [r.n for r in out2] == ["alice", "bob"]
    out3 = _run(g, """
        SELECT ?s WHERE {
          ?s rdf:type ?t .
          FILTER (?t != c:Robot)
        } ORDER BY ?s""").collect()
    assert [r.s for r in out3] == ["e:a", "e:b"]


def test_var_to_var_join_across_entities(g):
    out = _run(g, """
        SELECT ?n2 WHERE {
          e:a p:knows ?o .
          ?o p:name ?n2 .
        }""").collect()
    assert [r.n2 for r in out] == ["bob"]


def test_distinct_order_limit(g):
    out = _run(g, """
        SELECT DISTINCT ?t WHERE {
          ?s rdf:type ?t .
        } ORDER BY ?t DESC LIMIT 1""").collect()
    assert [r.t for r in out] == ["c:Robot"]


def test_parse_errors(g):
    with pytest.raises(ValueError):
        _run(g, "SELECT ?s WHERE { ?s p:name . }")  # 2-term pattern
    with pytest.raises(ValueError):
        _run(g, "nonsense query")


def test_group_by_aggregates(g):
    out = _run(g, """
        SELECT ?t (COUNT(?s) AS ?n) WHERE {
          ?s rdf:type ?t .
        } GROUP BY ?t ORDER BY ?t""").collect()
    assert [(r.t, r.n) for r in out] == [("c:Person", 2), ("c:Robot", 1)]
    out2 = _run(g, """
        SELECT ?t (MIN(?n) AS ?first) (COUNT(DISTINCT ?s) AS ?c)
        WHERE {
          ?s rdf:type ?t .
          ?s p:name ?n .
        } GROUP BY ?t ORDER BY ?t""").collect()
    assert [(r.t, r.first, r.c) for r in out2] \
        == [("c:Person", "alice", 2), ("c:Robot", "c3po", 1)]


def test_union_branches(g):
    out = _run(g, """
        SELECT ?s WHERE {
          { ?s rdf:type c:Robot . } UNION { ?s p:age ?a . }
        } ORDER BY ?s""").collect()
    assert [r.s for r in out] == ["e:a", "e:b", "e:c"]
    # missing vars on one branch bind NULL (SPARQL union semantics)
    out2 = _run(g, """
        SELECT ?s ?a WHERE {
          { ?s rdf:type c:Robot . } UNION { ?s p:age ?a . }
        } ORDER BY ?s""").collect()
    assert [(r.s, r.a) for r in out2] \
        == [("e:a", "31"), ("e:b", "9"), ("e:c", None)]


def test_aggregate_without_group_by_rejected(g):
    with pytest.raises(ValueError):
        _run(g, "SELECT (COUNT(?s) AS ?n) WHERE { ?s p:name ?x . }")


def test_construct_builds_derived_graph(g):
    from mms_rdf_spark.sparql import sparql_construct

    out = sparql_construct(g, """
        CONSTRUCT { ?s p:isA ?t . ?s p:flag "seen" . } WHERE {
          ?s rdf:type ?t .
          FILTER (?t = c:Person)
        }""").collect()
    got = {(r.subject, r.predicate, r.object) for r in out}
    assert got == {("e:a", "p:isA", "c:Person"),
                   ("e:b", "p:isA", "c:Person"),
                   ("e:a", "p:flag", "seen"),
                   ("e:b", "p:flag", "seen")}


def test_construct_optional_miss_emits_no_triple(g):
    from mms_rdf_spark.sparql import sparql_construct

    out = sparql_construct(g, """
        CONSTRUCT { ?s p:hasAge ?a . } WHERE {
          ?s p:name ?n .
          OPTIONAL { ?s p:age ?a . }
        }""").collect()
    assert {(r.subject, r.object) for r in out} \
        == {("e:a", "31"), ("e:b", "9")}  # e:c has no age -> no triple


def test_ask_existence(g):
    from mms_rdf_spark.sparql import sparql_ask

    assert sparql_ask(g, """
        ASK { ?s rdf:type c:Robot . ?s p:name ?n . }""") \
        .collect()[0].result is True
    assert sparql_ask(g, """
        ASK { ?s rdf:type c:Dragon . }""").collect()[0].result is False


def test_sequence_property_paths(g):
    out = _run(g, """
        SELECT ?n2 WHERE {
          e:a p:knows/p:name ?n2 .
        }""").collect()
    assert [r.n2 for r in out] == ["bob"]
    # path + ordinary pattern joined on the shared subject var
    out2 = _run(g, """
        SELECT ?s ?n2 WHERE {
          ?s p:knows/p:name ?n2 .
          ?s rdf:type c:Person .
        }""").collect()
    assert [(r.s, r.n2) for r in out2] == [("e:a", "bob")]
    # star projection hides the expansion intermediates
    star = _run(g, """
        SELECT * WHERE { ?s p:knows/p:name ?n2 . }""")
    assert all(not c.startswith("_pp") for c in star.columns)
