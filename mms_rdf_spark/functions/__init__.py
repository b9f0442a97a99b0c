from mms_rdf_spark.functions.iri import (  # noqa: F401
    EMAIL_RE,
    MENTION_KINDS,
    MENTION_RE,
    URL_RE,
    artifact_iri,
    artifact_iri_col,
    element_iri,
    element_iri_col,
    sanitize_suffix,
    sanitize_suffix_col,
    turn_element_id,
)
