"""Input scans: NDJSON transcripts (S2) and Turtle graphs (S6)."""

from mms_rdf_spark.sources.ndjson import read_transcripts_ndjson  # noqa: F401
from mms_rdf_spark.sources.ttl import read_ttl  # noqa: F401
