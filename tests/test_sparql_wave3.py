"""sparql_select wave 3: HAVING, subqueries, FILTER IN / BOUND,
BIND COALESCE / IF, and the loud unsupported-FILTER contract.

Reference parity: endpoint users combine GROUP BY with HAVING and
nest `{ SELECT ... }` subqueries routinely (SPARQL 1.1 §7, §12); the
reference's notebooks stop at plain GROUP BY, so these shapes are the
next thing a user pastes that used to fail."""

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


def test_having_aggregate_comparison(g):
    out = _run(g, """
        SELECT ?t (COUNT(?s) AS ?n) WHERE { ?s rdf:type ?t . }
        GROUP BY ?t HAVING (COUNT(?s) > 1)""").collect()
    assert [(r.t, r.n) for r in out] == [("c:Person", 2)]


def test_having_on_projected_alias(g):
    out = _run(g, """
        SELECT ?t (COUNT(?s) AS ?n) WHERE { ?s rdf:type ?t . }
        GROUP BY ?t HAVING (?n < 2)""").collect()
    assert [(r.t, r.n) for r in out] == [("c:Robot", 1)]


def test_having_conjunction(g):
    out = _run(g, """
        SELECT ?t (COUNT(?s) AS ?n) WHERE { ?s rdf:type ?t . }
        GROUP BY ?t HAVING (COUNT(?s) > 0 && COUNT(?s) < 2)""").collect()
    assert [(r.t, r.n) for r in out] == [("c:Robot", 1)]


def test_having_hidden_aggregate_not_projected(g):
    # the HAVING aggregate (MIN) is not in the SELECT list: computed
    # as a hidden column, filtered on, then dropped
    out = _run(g, """
        SELECT ?t (COUNT(?s) AS ?n) WHERE {
          ?s rdf:type ?t . ?s p:name ?m .
        } GROUP BY ?t HAVING (MIN(?m) = "alice")""")
    assert out.columns == ["t", "n"]
    assert [(r.t, r.n) for r in out.collect()] == [("c:Person", 2)]


def test_having_without_aggregates_raises(g):
    with pytest.raises(ValueError, match="HAVING"):
        _run(g, "SELECT ?s WHERE { ?s p:name ?n . } HAVING (?n > 1)")


def test_subquery_joins_on_projected_vars(g):
    out = sorted(_run(g, """
        SELECT ?s ?n ?cnt WHERE {
          ?s p:name ?n .
          ?s rdf:type ?t .
          { SELECT ?t (COUNT(?x) AS ?cnt) WHERE { ?x rdf:type ?t . }
            GROUP BY ?t }
        }""").collect())
    assert [(r.s, r.n, r.cnt) for r in out] == [
        ("e:a", "alice", 2), ("e:b", "bob", 2), ("e:c", "c3po", 1)]


def test_subquery_scoping_hides_inner_vars(g):
    # inner ?s is NOT projected -> invisible outside: the outer ?s
    # does not join against it (cross product of 3 names x 3 types)
    assert _run(g, """
        SELECT ?n ?t WHERE {
          ?s p:name ?n .
          { SELECT ?t WHERE { ?s rdf:type ?t . } }
        }""").count() == 9


def test_filter_in_and_not_in(g):
    got = sorted(r.n for r in _run(g, """
        SELECT ?n WHERE { ?s p:name ?n .
          FILTER(?n IN ("alice", "c3po")) }""").collect())
    assert got == ["alice", "c3po"]
    got = sorted(r.n for r in _run(g, """
        SELECT ?n WHERE { ?s p:name ?n .
          FILTER(?n NOT IN ("alice", "c3po")) }""").collect())
    assert got == ["bob"]


def test_filter_bound_with_optional(g):
    got = sorted(r.s for r in _run(g, """
        SELECT ?s WHERE { ?s p:name ?n .
          OPTIONAL { ?s p:age ?a . }
          FILTER(BOUND(?a)) }""").collect())
    assert got == ["e:a", "e:b"]
    got = sorted(r.s for r in _run(g, """
        SELECT ?s WHERE { ?s p:name ?n .
          OPTIONAL { ?s p:age ?a . }
          FILTER(!BOUND(?a)) }""").collect())
    assert got == ["e:c"]


def test_bind_coalesce_and_if(g):
    rows = {r.s: (r.age, r.cls) for r in _run(g, """
        SELECT ?s ?age ?cls WHERE { ?s p:name ?n .
          OPTIONAL { ?s p:age ?a . }
          BIND(COALESCE(?a, "0") AS ?age) .
          BIND(IF(?a > 10, "adult", "kid") AS ?cls) .
        }""").collect()}
    assert rows["e:a"] == ("31", "adult")
    assert rows["e:b"] == ("9", "kid")
    # unbound ?a: COALESCE falls through; IF's error leaves ?cls
    # UNBOUND (SPARQL error propagation), not the else branch
    assert rows["e:c"] == ("0", None)


def test_unsupported_filter_raises_not_silently_drops(g):
    with pytest.raises(ValueError, match="unsupported FILTER"):
        _run(g, "SELECT ?s WHERE { ?s p:name ?n . FILTER(isIRI(?s)) }")


def test_filter_boolean_combinations(g):
    # && with a range
    got = sorted(r.s for r in _run(g, """
        SELECT ?s WHERE { ?s p:age ?a .
          FILTER(?a > 5 && ?a < 20) }""").collect())
    assert got == ["e:b"]
    # || across different primitives
    got = sorted(r.n for r in _run(g, """
        SELECT ?n WHERE { ?s p:name ?n .
          FILTER(STRSTARTS(?n, "al") || CONTAINS(?n, "3po")) }
        """).collect())
    assert got == ["alice", "c3po"]
    # ! over a parenthesized disjunction, De Morgan
    got = sorted(r.n for r in _run(g, """
        SELECT ?n WHERE { ?s p:name ?n .
          FILTER(!(?n = "alice" || ?n = "bob")) }""").collect())
    assert got == ["c3po"]
    # nested parens + mixed precedence: && binds tighter than ||
    got = sorted(r.n for r in _run(g, """
        SELECT ?n WHERE { ?s p:name ?n . OPTIONAL { ?s p:age ?a . }
          FILTER(BOUND(?a) && ?a > 10 || ?n = "c3po") }""").collect())
    assert got == ["alice", "c3po"]


def test_filter_regex_case_insensitive_flag(g):
    got = sorted(r.n for r in _run(g, """
        SELECT ?n WHERE { ?s p:name ?n .
          FILTER regex(?n, "ALI", "i") }""").collect())
    assert got == ["alice"]


def test_projection_expressions(g):
    rows = {r.s: (r.len, r.bang) for r in _run(g, """
        SELECT ?s (STRLEN(?n) AS ?len) (CONCAT(?n, "!") AS ?bang)
        WHERE { ?s p:name ?n . }""").collect()}
    assert rows["e:a"] == (5, "alice!")
    assert rows["e:c"] == (4, "c3po!")
    # arithmetic expr + ORDER BY over the projected alias
    out = _run(g, """
        SELECT ?s (?a * 2 AS ?dbl) WHERE { ?s p:age ?a . }
        ORDER BY DESC(?dbl)""").collect()
    assert [(r.s, r.dbl) for r in out] == [("e:a", 62.0), ("e:b", 18.0)]


def test_projection_expression_unparseable_raises(g):
    with pytest.raises(ValueError, match="SELECT item"):
        _run(g, "SELECT (?n) WHERE { ?s p:name ?n . }")


def test_zero_or_one_path(g):
    # p? = identity over every graph term + the direct edges: e:a
    # reaches itself (zero) and e:b (one); e:b only itself
    out = _run(g, """
        SELECT ?x WHERE { e:a p:knows? ?x . }""").collect()
    assert sorted(r.x for r in out) == ["e:a", "e:b"]
    out2 = _run(g, """
        SELECT ?x WHERE { e:b p:knows? ?x . }""").collect()
    assert sorted(r.x for r in out2) == ["e:b"]


def test_zero_or_one_path_in_sequence(g):
    # sequence step: type of things a knows (zero-or-one hop first)
    out = _run(g, """
        SELECT ?x ?t WHERE { e:a p:knows?/rdf:type ?t .
                             BIND(e:a AS ?x) }""").collect()
    assert sorted(r.t for r in out) == ["c:Person", "c:Person"]


def test_zero_or_one_path_bound_object(g):
    # bound object side: who reaches e:b in <= 1 p:knows hop
    out = _run(g, """
        SELECT ?s WHERE { ?s p:knows? e:b . }""").collect()
    assert sorted(r.s for r in out) == ["e:a", "e:b"]
