"""Adapter: the driver's generic `events` table -> transcripts shape.

The driver's correctness gate (DuckDB oracle) can only see the
pre-registered testdata views, so the KG pipeline's oracle-checked
queries run over a transcripts table DERIVED deterministically from
`events`:

    conv_id  = cast(user_id as string)
    turn_idx = row_number() over (partition by user_id
                                  order by ts, event_id) - 1
    role     = click->user, view->assistant, signup->system,
               error->tool, purchase->NULL
    text     = props
    tool     = 'tool_' || user_id % 5   (only on error events)
    ts       = ts

The SAME derivation is written in ANSI SQL in __spark_entry__'s
oracle_sql entries, so DuckDB independently re-derives the input and
re-computes the expected triples — a true cross-engine check of the
conversion semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

ROLE_MAP_SQL = (
    "CASE event_type WHEN 'click' THEN 'user' WHEN 'view' THEN 'assistant' "
    "WHEN 'signup' THEN 'system' WHEN 'error' THEN 'tool' ELSE NULL END"
)

# the same derivation as an ANSI-SQL CTE body (DuckDB-compatible)
TRANSCRIPTS_SQL = """
    SELECT CAST(user_id AS VARCHAR) AS conv_id,
           CAST(row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) - 1 AS INT)
               AS turn_idx,
           {role} AS role,
           props AS text,
           CASE WHEN event_type = 'error'
                THEN 'tool_' || CAST(user_id % 5 AS VARCHAR) END AS tool,
           ts
    FROM events
""".format(role=ROLE_MAP_SQL)


def transcripts_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        F.col("user_id").cast("string").alias("conv_id"),
        (F.row_number().over(w) - 1).cast("int").alias("turn_idx"),
        F.expr(ROLE_MAP_SQL).alias("role"),
        F.col("props").alias("text"),
        F.when(F.col("event_type") == "error",
               F.concat(F.lit("tool_"),
                        (F.col("user_id") % 5).cast("string"))).alias("tool"),
        F.col("ts"),
    )


def triples_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full extraction over the derived transcripts — the pipeline's
    real extract stage on driver-visible data."""
    from mms_rdf_spark.operators.extract import extract_triples

    return extract_triples(spark, transcripts_from_events(spark, sf_dir))
