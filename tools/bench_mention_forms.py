"""Micro-benchmark: @entity: mention extraction, regex vs split form.

QUIET BOX ONLY. Measures single-core and multi-core throughput of the
two value-identical formulations (tests/test_functions.py pins the
equivalence):

  regex: regexp_extract_all(text, '@entity:([A-Za-z0-9_<>-]+)', 1)
  split: split on the literal marker, then a limit-2 class split per
         tail (short strings, Matcher stops at the first hit)

Context: JFR root-caused regexp thread-scaling to the UTF8String->
String copy + Matcher allocation path (BASELINE.md); split() measured
~0.9 marginal thread efficiency in the differential control while
regexp_* measured ~0.42. If the split form wins at high cores, it
becomes the extractor's default (the translate() swap story, applied
to run-extraction).

Prints one JSON line per (form, cores): rows/sec over the same corpus.
"""

from __future__ import annotations

import json
import subprocess
import sys
import time

WORKER = r"""
import json, sys, time
sys.path.insert(0, "/root/repo")
import pyspark.sql.functions as F
from mms_rdf_spark.session import get_spark
from mms_rdf_spark.functions.iri import MENTION_RE

form, cores = sys.argv[1], int(sys.argv[2])
spark = get_spark(f"mention-{form}-{cores}", cores=cores,
                  shuffle_partitions=cores)
spark.conf.set("spark.sql.files.maxPartitionBytes", str(4 * 1024 * 1024))

from mms_rdf_spark.synth import write_transcripts_parquet
path = write_transcripts_parquet(
    "build/transcripts_mentionbench", n_convs=2000, hot_conv_turns=1000,
    n_files=32, n_entities=2000)
t = spark.read.parquet(path)
t.count()  # warm

text = F.coalesce(F.col("text"), F.lit(""))
if form == "regex":
    surf = F.regexp_extract_all(text, F.lit(MENTION_RE), F.lit(1))
else:
    parts = F.split(text, r"@entity:")
    tails = F.slice(parts, 2, F.greatest(F.size(parts) - 1, F.lit(0)))
    surf = F.filter(
        F.transform(tails,
                    lambda p: F.split(p, r"[^A-Za-z0-9_<>-]", 2)[0]),
        lambda m: m != "")
# count total surfaces: forces full evaluation, no shuffle
expr = F.sum(F.size(surf))
n_rows = t.count()
best = None
for _ in range(3):
    t0 = time.time()
    total = t.agg(expr).collect()[0][0]
    dt = time.time() - t0
    best = dt if best is None or dt < best else best
print(json.dumps({"form": form, "cores": cores, "rows": n_rows,
                  "surfaces": int(total), "sec": round(best, 3),
                  "rows_per_sec": round(n_rows / best)}))
spark.stop()
"""


def main() -> None:
    for form in ("regex", "split"):
        for cores in (1, 8):
            out = subprocess.run(
                [sys.executable, "-c", WORKER, form, str(cores)],
                capture_output=True, text=True, timeout=1200)
            line = [l for l in out.stdout.splitlines()
                    if l.startswith("{")]
            print(line[-1] if line else out.stderr[-1500:])


if __name__ == "__main__":
    main()
