"""Graph-lane scaling pair (operator-class breadth alongside the
official extraction pair in bench_scaling.py and the asof/curate/
decode lanes): iterative PageRank at local[1] vs local[4] on the same
4M-edge skewed IRI-keyed graph.

PRE-REGISTERED protocol — MARGINAL per-iteration throughput: each
(mode, cores) level is one JVM that warms up at 5 iterations, then
runs INTERLEAVED timed jobs at iters=1 and iters=5 (3 reps each,
medians); the lane metric is edges*(5-1)/(med5 - med1) — the
steady-state cost of one more iteration, which is what a
30-iteration production PageRank is made of. Interleaving inside one
JVM cancels JIT/page-cache/memory-pressure drift (differencing
across separately-warmed JVMs measured a dt smaller than the warm-up
disparity itself). One-time setup (edge/dict checkpoint
materialization, memory-copy bound, amortized to noise at real
iteration counts) is visible as sec_1iter, not hidden inside the
headline ratio. Two modes: encode (dense long ids — the
production path) and string (raw IRI keys). Writes
BENCH_scaling_graph.json. Run on a QUIET box only."""

from __future__ import annotations

import json
import subprocess
import sys

sys.path.insert(0, "/root/repo")

DATA = "/root/repo/build/edges_scaling_graph"
PAIR = (1, 4)
ITERS = (1, 5)
REPS = 3


def run(args: list[str]) -> str:
    out = subprocess.run([sys.executable,
                          "/root/repo/tools/scaling_worker_graph.py",
                          *args], capture_output=True, text=True,
                         check=True)
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    return lines[-1] if lines else ""


def main() -> None:
    run(["synth", DATA])
    out = {}
    for mode in ("encode", "string"):
        extra = [mode] if mode == "encode" else []
        levels = {}
        for cores in PAIR:
            r = json.loads(run([str(cores), DATA, str(REPS), *extra]))
            levels[cores] = r
            print(f"{mode} cores={cores}: marginal "
                  f"{r['marginal_edge_iters_per_sec']:,.0f} "
                  f"edge-iters/s (1iter {r['sec_1iter']}s, "
                  f"5iter {r['sec_5iter']}s)", flush=True)
        lo = levels[PAIR[0]]["marginal_edge_iters_per_sec"]
        hi = levels[PAIR[1]]["marginal_edge_iters_per_sec"]
        eff = (hi / lo) / (PAIR[1] / PAIR[0])
        out[mode] = {"pair": {
            "N": PAIR[0], "4N": PAIR[1],
            "marginal_edge_iters_per_sec_N": lo,
            "marginal_edge_iters_per_sec_4N": hi,
            "scaling_efficiency": round(eff, 3)},
            "protocol": {"stat": "median", "reps": REPS,
                         "iters_levels": list(ITERS),
                         "metric": "marginal per-iteration rate",
                         "interleaved_in_one_jvm": True},
            "levels": levels}
        print(json.dumps(out[mode]["pair"]))
    with open("/root/repo/BENCH_scaling_graph.json", "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
