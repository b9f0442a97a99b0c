"""Scaling-efficiency evidence (north rule): the same extraction job at
two parallelism levels — local[8] vs local[32] as the sandbox proxy for
N vs 4N executors — on the same input. Reports throughput at both and
eff = (thr_32 / thr_8) / 4; target >= 0.8.

Writes BENCH_scaling.json and prints a markdown row for BASELINE.md.
"""

from __future__ import annotations

import json
import subprocess
import sys

sys.path.insert(0, "/root/repo")

DATA = "/root/repo/build/transcripts_scaling"


def run(cores: int, reps: int = 3) -> dict:
    out = subprocess.run(
        [sys.executable, "/root/repo/tools/scaling_worker.py",
         str(cores), DATA, str(reps)],
        capture_output=True, text=True, check=True)
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    from mms_rdf_spark.synth import write_transcripts_parquet

    # ~1M turns: big enough that per-job fixed overheads (task launch,
    # result collection) are noise against real work at both levels
    write_transcripts_parquet(DATA, n_convs=36000, seed=42,
                              hot_conv_turns=2000, n_hot_convs=3,
                              n_files=128)
    lo = run(8)
    hi = run(32)
    eff = (hi["triples_per_sec"] / lo["triples_per_sec"]) / (32 / 8)
    result = {"local8": lo, "local32": hi,
              "scaling_efficiency": round(eff, 3)}
    with open("/root/repo/BENCH_scaling.json", "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(result))
    print(f"\n| extraction throughput local[8] | {lo['triples_per_sec']:,} triples/s | "
          f"{lo['turns']} turns x {lo['reps']} reps | measured |")
    print(f"| extraction throughput local[32] | {hi['triples_per_sec']:,} triples/s | "
          f"same input | measured |")
    print(f"| scaling efficiency 8->32 cores | {eff:.3f} | target >= 0.8 | measured |")


if __name__ == "__main__":
    main()
