"""spark-submit entry for the full KG-construction pipeline.

This is the north-rule deployment path run FOR REAL by
tests/test_spark_submit.py:

    spark-submit --master local[8] --py-files mms_rdf_spark.zip \
        tools/submit_pipeline.py --input transcripts.parquet --out build/run1

Unlike `python -m mms_rdf_spark.pipeline` (which builds its own session
via session.get_spark), this entry takes the session from spark-submit:
`SparkSession.builder.getOrCreate()` picks up --master / --conf from the
launcher exactly as it would on a real cluster, and `mms_rdf_spark` is
imported from the shipped --py-files zip, not from a checkout on the
driver's sys.path. Prints ONE JSON line:

    {"stages": {name: rows, ...}, "amended_hash": md5-of-sorted-rows}

so a checker can compare content (not just counts) against an
in-process run of the same pipeline on the same input.
"""

from __future__ import annotations

import argparse
import hashlib
import json

from pyspark.sql import SparkSession


def content_hash(df) -> str:
    """Order-insensitive md5 of the stringified rows (checker protocol:
    columns sorted by name, rows sorted, NULL spelled out)."""
    pdf = df.toPandas()
    pdf = pdf[sorted(pdf.columns)].astype(str)
    rows = sorted(",".join(r) for r in pdf.itertuples(index=False, name=None))
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--no-resume", action="store_true")
    args = ap.parse_args()

    # session comes from spark-submit (--master/--conf), not get_spark
    spark = SparkSession.builder.getOrCreate()
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        from mms_rdf_spark.pipeline import run_pipeline  # from --py-files zip

        out = run_pipeline(spark, args.input, args.out,
                           resume=not args.no_resume)
        print(json.dumps({
            "stages": {k: v.count() for k, v in out.items()},
            "amended_hash": content_hash(out["amended"]),
        }))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
