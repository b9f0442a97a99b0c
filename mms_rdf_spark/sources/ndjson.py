"""NDJSON transcript scan (S2).

The reference's input is NDJSON streamed from the MMS REST API
(src/class/mms-client.js download -> newline-delimited element JSON,
split on byte ranges by src/data/triplify-async.js). Spark restates
both halves as one `spark.read.json` with a PINNED schema:

  - S2 streaming JSON parse -> Jackson per line inside the scan
  - S3 byte-range split + newline alignment -> Spark's line-based
    split planning (a JSON line never spans splits)

The schema is pinned, never inferred: schema inference is a full
pre-scan of the input — at 100 TB that is the difference between one
pass and two. Malformed lines land in `_corrupt_record` (PERMISSIVE)
instead of failing the job, mirroring the reference's degrade-and-warn
posture (R11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

TRANSCRIPT_NDJSON_SCHEMA = StructType([
    StructField("conv_id", StringType()),
    StructField("turn_idx", IntegerType()),
    StructField("role", StringType()),
    StructField("text", StringType()),
    StructField("tool", StringType()),
    StructField("ts", TimestampNTZType()),
    StructField("_corrupt_record", StringType()),
])


def read_transcripts_ndjson(spark: SparkSession, path: str,
                            drop_corrupt: bool = True) -> DataFrame:
    """One JSON object per line -> the canonical transcripts shape.

    Implemented as `read.text` + `from_json` rather than `read.json`:
    identical line-based split planning, but the corrupt-record column
    is an ordinary column (read.json's internal corrupt column cannot
    be filtered without caching the whole scan — a non-starter at
    100 TB). drop_corrupt=False keeps `_corrupt_record` for the
    quarantine side-output pattern (count it, sink it, never fail)."""
    parsed = (spark.read.text(path)
              .where(F.col("value") != "")
              .select(F.from_json(
                  "value", TRANSCRIPT_NDJSON_SCHEMA,
                  {"mode": "PERMISSIVE",
                   "columnNameOfCorruptRecord": "_corrupt_record",
                   "timestampNTZFormat": "yyyy-MM-dd'T'HH:mm:ss"})
                  .alias("j"))
              .select("j.*"))
    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    if drop_corrupt:
        return parsed.where(F.col("_corrupt_record").isNull()).select(cols)
    return parsed.select(cols + ["_corrupt_record"])
