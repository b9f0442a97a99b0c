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


def test_aggregate_without_group_by_implicit_single_group(g):
    # SPARQL semantics: aggregates with no GROUP BY form one group
    out = _run(g, "SELECT (COUNT(?s) AS ?n) WHERE { ?s p:name ?x . }")
    assert [r.n for r in out.collect()] == [3]


def test_sum_avg_sample_group_concat(g):
    out = _run(g, """
        SELECT ?t (SUM(?a) AS ?s) (AVG(?a) AS ?m) WHERE {
          ?s rdf:type ?t .
          ?s p:age ?a .
        } GROUP BY ?t""").collect()
    assert [(r.t, r.s, r.m) for r in out] == [("c:Person", 40.0, 20.0)]
    out2 = _run(g, """
        SELECT ?t (GROUP_CONCAT(?n) AS ?names) (SAMPLE(?n) AS ?one)
        WHERE {
          ?s rdf:type ?t .
          ?s p:name ?n .
        } GROUP BY ?t ORDER BY ?t""").collect()
    # GROUP_CONCAT is deterministic (sorted), SAMPLE picks the min
    assert [(r.t, r.names, r.one) for r in out2] \
        == [("c:Person", "alice bob", "alice"),
            ("c:Robot", "c3po", "c3po")]
    out3 = _run(g, """
        SELECT ?t (GROUP_CONCAT(?n; SEPARATOR=",") AS ?names) WHERE {
          ?s rdf:type ?t .
          ?s p:name ?n .
        } GROUP BY ?t ORDER BY ?t""").collect()
    assert [r.names for r in out3] == ["alice,bob", "c3po"]


def test_filter_not_exists_anti_join(g):
    # persons with no p:knows edge (the amend-query shape)
    out = _run(g, """
        SELECT ?s WHERE {
          ?s rdf:type c:Person .
          FILTER NOT EXISTS { ?s p:knows ?o . }
        }""").collect()
    assert [r.s for r in out] == ["e:b"]
    # inner pattern introducing fresh vars anti-joins on shared only
    out2 = _run(g, """
        SELECT ?s WHERE {
          ?s p:name ?n .
          FILTER NOT EXISTS { ?s p:age ?a . }
        }""").collect()
    assert [r.s for r in out2] == ["e:c"]


def test_values_inline_table(g):
    out = _run(g, """
        SELECT ?s ?n WHERE {
          ?s p:name ?n .
          VALUES ?s { e:a e:c }
        } ORDER BY ?s""").collect()
    assert [(r.s, r.n) for r in out] == [("e:a", "alice"),
                                         ("e:c", "c3po")]


def test_semicolon_lists_and_a_keyword(g):
    # notebook shorthand: `;` predicate-object lists, `a` = rdf:type,
    # no WHERE keyword, trailing `; .`
    out = _run(g, """
        select ?s ?n {
          ?s a c:Person ;
             p:name ?n ;
             .
        } ORDER BY ?s""").collect()
    assert [(r.s, r.n) for r in out] == [("e:a", "alice"),
                                         ("e:b", "bob")]


def test_filter_no_space_and_iri_rhs(g):
    # `filter(...)` with no space and an IRI right-hand side, as in
    # the reference's amend query (ammend.js:35-38)
    out = _run(g, """
        select ?s {
          ?s rdf:type ?t .
          filter(?t != c:Robot)
        } ORDER BY ?s""").collect()
    assert [r.s for r in out] == ["e:a", "e:b"]


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


@pytest.fixture()
def hier(spark):
    # a small class hierarchy + typed instances, the triplifier.js
    # `rdfs:subClassOf*` shape (453-455)
    rows = [
        ("c:Dog", "rdfs:subClassOf", "c:Mammal"),
        ("c:Mammal", "rdfs:subClassOf", "c:Animal"),
        ("c:Robot", "rdfs:subClassOf", "c:Machine"),
        ("e:rex", "rdf:type", "c:Dog"),
        ("e:tom", "rdf:type", "c:Mammal"),
        ("e:r2", "rdf:type", "c:Robot"),
    ]
    return spark.createDataFrame(
        rows, "subject string, predicate string, object string")


def test_closure_path_plus(hier):
    out = _run(hier, """
        SELECT ?s ?o WHERE {
          ?s rdfs:subClassOf+ ?o .
        } ORDER BY ?s, ?o""").collect()
    assert [(r.s, r.o) for r in out] == [
        ("c:Dog", "c:Animal"), ("c:Dog", "c:Mammal"),
        ("c:Mammal", "c:Animal"), ("c:Robot", "c:Machine")]


def test_closure_path_star_includes_zero_hop(hier):
    # bound object: every class reaching c:Animal, including itself
    out = _run(hier, """
        SELECT ?s WHERE {
          ?s rdfs:subClassOf* c:Animal .
        } ORDER BY ?s""").collect()
    assert [r.s for r in out] == ["c:Animal", "c:Dog", "c:Mammal"]


def test_sequence_path_ending_in_closure(hier):
    # the amend-query shape: `?x a/rdfs:subClassOf* <cls>`
    out = _run(hier, """
        SELECT ?s WHERE {
          ?s a/rdfs:subClassOf* c:Animal .
        } ORDER BY ?s""").collect()
    assert [r.s for r in out] == ["e:rex", "e:tom"]


def test_describe(g):
    from mms_rdf_spark.sparql import sparql_describe

    out = sparql_describe(g, "DESCRIBE e:a").collect()
    assert {(r.predicate, r.object) for r in out} \
        == {("rdf:type", "c:Person"), ("p:name", "alice"),
            ("p:age", "31"), ("p:knows", "e:b")}
    out2 = sparql_describe(g, """
        DESCRIBE ?s WHERE { ?s rdf:type c:Robot . }""").collect()
    assert {r.subject for r in out2} == {"e:c"}
    assert len(out2) == 2


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


# ---- round-5 additions: MINUS / BIND / OFFSET / path alternation /
# inverse paths / var-to-var FILTER


def test_minus_removes_compatible_bindings(g):
    out = _run(g, """
        SELECT ?s WHERE {
          ?s p:name ?n .
          MINUS { ?s rdf:type c:Robot . }
        } ORDER BY ?s""").collect()
    assert [r.s for r in out] == ["e:a", "e:b"]


def test_minus_disjoint_domains_is_noop(g):
    # SPARQL: MINUS with no shared variable removes NOTHING —
    # the one observable divergence from FILTER NOT EXISTS, which
    # this front-end surfaces as an error for the same shape
    out = _run(g, """
        SELECT ?s WHERE {
          ?s p:name ?n .
          MINUS { ?x rdf:type c:Robot . }
        }""").collect()
    assert len(out) == 3


def test_bind_string_builtins_and_chaining(g):
    rows = {r.s: r for r in _run(g, """
        SELECT ?s ?len ?loud ?tag WHERE {
          ?s p:name ?n .
          BIND(STRLEN(?n) AS ?len) .
          BIND(UCASE(?n) AS ?loud) .
          BIND(CONCAT(?loud, "#", ?s) AS ?tag) .
        }""").collect()}
    assert rows["e:a"].len == 5 and rows["e:a"].loud == "ALICE"
    assert rows["e:b"].tag == "BOB#e:b"  # BIND var feeds later BIND


def test_bind_substr_before_after_replace(g):
    rows = {r.s: r for r in _run(g, """
        SELECT ?s ?pre ?loc ?ns ?fix WHERE {
          ?s p:name ?n .
          BIND(SUBSTR(?n, 1, 3) AS ?pre) .
          BIND(STRAFTER(?s, "e:") AS ?loc) .
          BIND(STRBEFORE(?s, ":") AS ?ns) .
          BIND(REPLACE(?n, "[aeiou]", "_") AS ?fix) .
        }""").collect()}
    assert rows["e:a"].pre == "ali" and rows["e:a"].loc == "a"
    assert rows["e:a"].ns == "e" and rows["e:a"].fix == "_l_c_"
    assert rows["e:c"].fix == "c3p_"


def test_bind_substr_no_length_and_missing_separator(g):
    rows = {r.s: r for r in _run(g, """
        SELECT ?s ?tail ?none ?noneb WHERE {
          ?s p:name ?n .
          BIND(SUBSTR(?n, 2) AS ?tail) .
          BIND(STRAFTER(?n, "zzz") AS ?none) .
          BIND(STRBEFORE(?n, "zzz") AS ?noneb) .
        }""").collect()}
    assert rows["e:a"].tail == "lice"
    # XPath: empty string when the separator does not occur
    assert rows["e:a"].none == "" and rows["e:a"].noneb == ""


def test_bind_replace_case_insensitive_flag(g):
    rows = {r.s: r.up for r in _run(g, """
        SELECT ?s ?up WHERE {
          ?s p:name ?n .
          BIND(UCASE(?n) AS ?N) .
          BIND(REPLACE(?N, "o", "0", "i") AS ?up) .
        }""").collect()}
    assert rows["e:b"] == "B0B"
    assert rows["e:c"] == "C3P0"


def test_bind_arithmetic_promotes_numeric(g):
    rows = {r.s: r.half for r in _run(g, """
        SELECT ?s ?half WHERE {
          ?s p:age ?a .
          BIND(?a / 2 AS ?half) .
        }""").collect()}
    assert rows["e:a"] == 15.5  # "31" promoted to xsd double
    # BIND output usable in FILTER and ORDER BY
    out = _run(g, """
        SELECT ?s WHERE {
          ?s p:age ?a .
          BIND(?a * 2 AS ?dbl) .
          FILTER (?dbl > 20)
        }""").collect()
    assert [r.s for r in out] == ["e:a"]


def test_limit_offset_pagination(g):
    base = """
        SELECT ?n WHERE { ?s p:name ?n . } ORDER BY ?n"""
    assert [r.n for r in _run(g, base + " LIMIT 2 OFFSET 1").collect()] \
        == ["bob", "c3po"]
    # OFFSET-before-LIMIT spelling parses too
    assert [r.n for r in _run(g, base + " OFFSET 2 LIMIT 5").collect()] \
        == ["c3po"]


def test_path_alternation_is_bag_union(g):
    out = _run(g, """
        SELECT ?s ?x WHERE {
          ?s p:name|p:age ?x .
        } ORDER BY ?s ?x""").collect()
    assert [(r.s, r.x) for r in out] == [
        ("e:a", "31"), ("e:a", "alice"), ("e:b", "9"),
        ("e:b", "bob"), ("e:c", "c3po")]


def test_inverse_path_swaps_endpoints(g):
    out = _run(g, """
        SELECT ?o WHERE { ?o ^p:knows e:a . }""").collect()
    assert [r.o for r in out] == ["e:b"]
    # inverse inside an alternation element
    out2 = _run(g, """
        SELECT ?s ?x WHERE {
          ?s p:knows|^p:knows ?x .
        } ORDER BY ?s""").collect()
    assert [(r.s, r.x) for r in out2] == [("e:a", "e:b"), ("e:b", "e:a")]
    # inverse sequence: ^knows/name == name of whoever knows you
    out3 = _run(g, """
        SELECT ?n WHERE { e:b ^p:knows/p:name ?n . }""").collect()
    assert [r.n for r in out3] == ["alice"]


def test_filter_var_to_var(g):
    out = _run(g, """
        SELECT ?a ?b WHERE {
          ?a p:knows ?b .
          ?a p:name ?na .
          ?b p:name ?nb .
          FILTER (?na < ?nb)
        }""").collect()
    assert [(r.a, r.b) for r in out] == [("e:a", "e:b")]


def test_filter_exists_semi_join(g):
    out = _run(g, """
        SELECT ?s WHERE {
          ?s p:name ?n .
          FILTER EXISTS { ?s p:age ?a . }
        } ORDER BY ?s""").collect()
    assert [r.s for r in out] == ["e:a", "e:b"]
    with pytest.raises(ValueError):
        _run(g, """
            SELECT ?s WHERE {
              ?s p:name ?n .
              FILTER EXISTS { ?x p:age ?a . }
            }""")


def test_negated_property_set(g):
    out = _run(g, """
        SELECT ?x WHERE { e:a !(p:name|rdf:type) ?x . } ORDER BY ?x
        """).collect()
    assert [r.x for r in out] == ["31", "e:b"]  # age + knows survive
    out2 = _run(g, """
        SELECT ?s WHERE { ?s !a c:Person . }""").collect()
    assert out2 == []  # only rdf:type reaches c:Person, and it's negated


def test_union_group_joined_with_other_patterns(g):
    out = _run(g, """
        SELECT ?s ?n WHERE {
          { ?s rdf:type c:Person . } UNION { ?s rdf:type c:Robot . }
          ?s p:name ?n .
        } ORDER BY ?s""").collect()
    assert [(r.s, r.n) for r in out] == [
        ("e:a", "alice"), ("e:b", "bob"), ("e:c", "c3po")]
    # branch-local plain FILTER survives the recursion
    out2 = _run(g, """
        SELECT ?s ?n WHERE {
          { ?s p:age ?a . FILTER (?a > 10) } UNION { ?s rdf:type c:Robot . }
          ?s p:name ?n .
        } ORDER BY ?s""").collect()
    assert [(r.s, r.n) for r in out2] == [("e:a", "alice"),
                                          ("e:c", "c3po")]


def test_filter_string_functions(g):
    out = _run(g, """
        SELECT ?n WHERE {
          ?s p:name ?n .
          FILTER (STRSTARTS(?n, "a"))
        }""").collect()
    assert [r.n for r in out] == ["alice"]
    out2 = _run(g, """
        SELECT ?n WHERE {
          ?s p:name ?n .
          FILTER (CONTAINS(?n, "o"))
        } ORDER BY ?n""").collect()
    assert [r.n for r in out2] == ["bob", "c3po"]
    out3 = _run(g, """
        SELECT ?n WHERE {
          ?s p:name ?n .
          FILTER (STRENDS(?n, "b"))
        }""").collect()
    assert [r.n for r in out3] == ["bob"]
