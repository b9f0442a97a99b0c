from mms_rdf_spark.functions.iri import (  # noqa: F401
    MENTION_RE,
    artifact_iri,
    artifact_iri_col,
    element_iri,
    element_iri_col,
    sanitize_suffix,
    sanitize_suffix_col,
    turn_element_id,
)
