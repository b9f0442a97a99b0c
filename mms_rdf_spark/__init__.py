"""mms_rdf_spark — a PySpark-native knowledge-graph construction engine.

A from-scratch, Spark-first re-expression of the capabilities of
Open-MBEE/mms-rdf (a Node.js "triple factory" that converts streams of
semi-structured records into an RDF graph + LPG view, driven by a
vocabulary/TBox): see SURVEY.md for the full behavioral inventory.

Pipeline stages (each a pure DataFrame -> DataFrame transformation):

    transcripts (conv_id, turn_idx, role, text, tool, ts)
        -> extract   : vocabulary-driven triple extraction (Arrow-batched)
        -> link      : blocking-key candidate generation + similarity edges
        -> cc        : connected-components canonicalization (hash-min)
        -> materialize: partitioned SPO tables + LPG nodes/edges view
        -> amend     : dangling-object gap-fill (anti-join loop)

Everything heavy is DataFrame ops / pandas-on-Arrow UDFs; no per-row
Python in hot paths; no RDDs.
"""

__version__ = "0.1.0"

PREFIXES = {
    # mirrors the reference's prefix map (reference config.js:4-53) —
    # only the prefixes the converter actually mints with.
    "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
    "owl": "http://www.w3.org/2002/07/owl#",
    "xsd": "http://www.w3.org/2001/XMLSchema#",
    "mms-element": "https://mms.openmbee.org/element#",
    "mms-artifact": "https://mms.openmbee.org/artifact#",
    "mms-class": "https://mms.openmbee.org/class#",
    "mms-property": "https://mms.openmbee.org/property#",
    "mms-ontology": "https://mms.openmbee.org/ontology#",
    "mms-graph": "https://mms.openmbee.org/graph#",
}

RDF_TYPE = "rdf:type"
RDF_NIL = "rdf:nil"
