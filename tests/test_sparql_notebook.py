"""Endpoint-notebook parity: the reference's OWN embedded queries run
VERBATIM through the string front-end.

Query strings are copied character-for-character from the reference's
demo notebook and amend action (the behavior spec, SURVEY.md §2.10):

  - notebooks/tmt-demo.ipynb cell 9  (unused activities:
    filter not exists)
  - notebooks/tmt-demo.ipynb cell 15 (sent-but-unreceived signals)
  - notebooks/tmt-demo.ipynb cell 17 (received-but-unsent signals)
  - notebooks/tmt-demo.ipynb cell 19 (values inline table)
  - notebooks/tmt-demo.ipynb cell 5  (construct + values + from)
  - notebooks/tmt-demo.ipynb cell 6  (construct + rdfs:subClassOf*)
  - src/action/ammend.js:35-38       (dangling elements:
    a/rdfs:subClassOf* + filter + filter not exists)

The fixture graph is built so every query has a non-trivial pinned
answer; a reference user can paste their endpoint queries unchanged.
"""

from __future__ import annotations

import pytest

SIG_IRI = "mms-element:_18_0_2_b4c02e1_1428620907858_598008_291134"


@pytest.fixture()
def graph(spark):
    rows = [
        # --- activities (cell 9): act1 referenced, act2 unused
        ("mms-element:act1", "rdf:type", "mms-class:Activity"),
        ("mms-element:act1", "rdfs:label", "Act One"),
        ("mms-element:act2", "rdf:type", "mms-class:Activity"),
        ("mms-element:act2", "rdfs:label", "Act Two"),
        ("mms-element:ref1", "mms-property:activityId",
         "mms-element:act1"),
        # --- signals (cells 15/17): sigA sent+received,
        #     sigB sent only, sigC received only
        ("mms-element:sigA", "rdf:type", "mms-class:Signal"),
        ("mms-element:sigA", "rdfs:label", "A"),
        ("mms-element:sigB", "rdf:type", "mms-class:Signal"),
        ("mms-element:sigB", "rdfs:label", "B"),
        ("mms-element:sigC", "rdf:type", "mms-class:Signal"),
        ("mms-element:sigC", "rdfs:label", "C"),
        ("mms-element:send1", "rdf:type", "mms-class:SendSignalAction"),
        ("mms-element:send1", "mms-property:signalId",
         "mms-element:sigA"),
        ("mms-element:send2", "rdf:type", "mms-class:SendSignalAction"),
        ("mms-element:send2", "mms-property:signalId",
         "mms-element:sigB"),
        ("mms-element:recv1", "rdf:type", "mms-class:Reception"),
        ("mms-element:recv1", "mms-property:signalId",
         "mms-element:sigA"),
        ("mms-element:recv2", "rdf:type", "mms-class:Reception"),
        ("mms-element:recv2", "mms-property:signalId",
         "mms-element:sigC"),
        # --- cell 19: one of the verbatim VALUES IRIs exists here
        (SIG_IRI, "rdfs:label", "ControlSignal"),
        ("mms-element:refX", "rdf:type", "mms-class:Reception"),
        ("mms-element:refX", "mms-property:signalId", SIG_IRI),
        # --- vocabulary (cells 5/6): property defs + class hierarchy
        ("p:owner", "xmi:type", "uml:Property"),
        ("p:owner", "rdfs:domain", "uml-class:Activity"),
        ("p:owner", "rdfs:range", "c:String"),
        ("p:decoy", "xmi:type", "uml:Property"),
        ("p:decoy", "rdfs:domain", "uml-class:Widget"),
        ("p:decoy", "rdfs:range", "c:Int"),
        ("uml-class:Class", "rdfs:subClassOf", "uml-class:Classifier"),
        ("uml-class:Classifier", "rdfs:subClassOf", "uml-class:Element"),
        ("uml-class:Widget", "rdfs:subClassOf", "uml-class:Thing"),
        # --- amend (ammend.js): object-property hierarchy + dangling
        ("p:knows", "rdf:type", "c:SubProp"),
        ("c:SubProp", "rdfs:subClassOf", "mms-ontology:ObjectProperty"),
        ("p:label", "rdf:type", "mms-ontology:DatatypeProperty"),
        ("e:x", "p:knows", "e:dangling"),
        ("e:x", "p:knows", "e:y"),
        ("e:y", "p:knows", "rdf:nil"),
        ("e:x", "p:label", "not an element"),
    ]
    return spark.createDataFrame(
        rows, "subject string, predicate string, object string")


def test_cell9_unused_activities(graph):
    from mms_rdf_spark.sparql import sparql_select

    out = sparql_select(graph, """
select ?activity ?label {
   ?activity a mms-class:Activity ;
      rdfs:label ?label ;
      .

   filter not exists {
      ?ref mms-property:activityId ?activity .
   }
}
""").collect()
    assert [(r.activity, r.label) for r in out] \
        == [("mms-element:act2", "Act Two")]


def test_cell15_sent_but_unreceived_signals(graph):
    from mms_rdf_spark.sparql import sparql_select

    out = sparql_select(graph, """
select ?signal ?label {
   ?signal a mms-class:Signal ;
      rdfs:label ?label ;
      .

   ?sentSignal a mms-class:SendSignalAction ;
      mms-property:signalId ?signal ;
      .

   filter not exists {
      ?received a mms-class:Reception ;
         mms-property:signalId ?signal ;
         .
   }
}
""").collect()
    assert [(r.signal, r.label) for r in out] \
        == [("mms-element:sigB", "B")]


def test_cell17_received_but_unsent_signals(graph):
    from mms_rdf_spark.sparql import sparql_select

    out = sparql_select(graph, """
select ?signal ?label {
   ?signal a mms-class:Signal ;
      rdfs:label ?label ;
      .

    ?received a mms-class:Reception ;
       mms-property:signalId ?signal ;
       .

   filter not exists {
      ?sentSignal a mms-class:SendSignalAction ;
         mms-property:signalId ?signal ;
         .
   }
}
""").collect()
    assert [(r.signal, r.label) for r in out] \
        == [("mms-element:sigC", "C")]


def test_cell19_values_inline_table(graph):
    from mms_rdf_spark.sparql import sparql_select

    out = sparql_select(graph, """
select * {
   ?signal rdfs:label ?signalLabel .

   ?ref a ?refType ;
      mms-property:signalId ?signal ;
      .


   values ?signal {
      mms-element:_18_0_2_b4c02e1_1428620907858_598008_291134
      mms-element:_17_0_2_3_41e01aa_1381862763680_701901_73001
      mms-element:_17_0_2_3_b4c02e1_1378391972994_739726_45001
      mms-element:_17_0_2_3_b4c02e1_1378391972992_879691_44995
      mms-element:_17_0_2_3_b4c02e1_1378391972996_985068_45006
      mms-element:_18_0_2_baa02e2_1429906373056_452586_146143
      mms-element:_17_0_2_3_b4c02e1_1378391972995_121592_45003
      mms-element:_18_0_2_baa02e2_1429906373055_517994_146137
   }
}
""").collect()
    assert [(r.signal, r.signalLabel, r.ref, r.refType)
            for r in out] \
        == [(SIG_IRI, "ControlSignal", "mms-element:refX",
             "mms-class:Reception")]


def test_cell5_construct_domain_diagram(graph):
    from mms_rdf_spark.sparql import sparql_construct

    out = sparql_construct(graph, """
construct {
    ?domain :isDomainOf ?property .
    ?property :range ?range .
} from mms-graph:vocabulary {
    ?property xmi:type uml:Property ;
              rdfs:domain ?domain ;
              rdfs:range ?range .
    values ?domain {
        uml-class:Activity
    }
}
""").collect()
    assert {(r.subject, r.predicate, r.object) for r in out} == {
        ("uml-class:Activity", ":isDomainOf", "p:owner"),
        ("p:owner", ":range", "c:String"),
    }


def test_cell6_construct_superclass_closure(graph):
    from mms_rdf_spark.sparql import sparql_construct

    out = sparql_construct(graph, """
construct {
    ?class rdfs:subClassOf ?superClass .
} from mms-graph:vocabulary {
    ?class rdfs:subClassOf ?superClass .
    uml-class:Class rdfs:subClassOf* ?class .
}
""").collect()
    assert {(r.subject, r.object) for r in out} == {
        ("uml-class:Class", "uml-class:Classifier"),
        ("uml-class:Classifier", "uml-class:Element"),
    }


def test_amend_dangling_elements_query(graph):
    # src/action/ammend.js:35-38, verbatim
    from mms_rdf_spark.sparql import sparql_select

    out = sparql_select(graph, """
		select distinct ?element {
			?source ?property ?element .

			?property a/rdfs:subClassOf* mms-ontology:ObjectProperty .

			filter(?element != rdf:nil)

			filter not exists {
				?element ?p ?o .
			}
		}
	""").collect()
    assert [r.element for r in out] == ["e:dangling"]
