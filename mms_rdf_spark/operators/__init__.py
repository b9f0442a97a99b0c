"""Operator surface of the engine — import the common entry points
directly from this package."""

from mms_rdf_spark.operators.amend import amend, dangling_objects  # noqa: F401
from mms_rdf_spark.operators.cc import connected_components  # noqa: F401
from mms_rdf_spark.operators.curate import curate  # noqa: F401
from mms_rdf_spark.operators.extract import (  # noqa: F401
    extract_triples,
    extract_triples_joined,
    extract_turn_triples_arrow,
)
from mms_rdf_spark.operators.link import (  # noqa: F401
    candidate_edges,
    distinct_surfaces,
    entity_table,
)
from mms_rdf_spark.operators.sessionize import sessionize  # noqa: F401