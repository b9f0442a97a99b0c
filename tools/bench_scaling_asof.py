"""As-of-join scaling pair (operator-class breadth alongside the
official extraction pair in bench_scaling.py): the same union+window
as-of join at local[1] vs local[4] — both below this host's memory-
bandwidth knee (BASELINE.md) — on the same 4M-event input. Writes
BENCH_scaling_asof.json and prints a markdown row for BASELINE.md.
Run on a QUIET box only."""

from __future__ import annotations

import json
import subprocess
import sys

sys.path.insert(0, "/root/repo")

DATA = "/root/repo/build/events_scaling_asof"
PAIR = (1, 4)


def run(args: list[str]) -> str:
    out = subprocess.run([sys.executable,
                          "/root/repo/tools/scaling_worker_asof.py",
                          *args], capture_output=True, text=True,
                         check=True)
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    return lines[-1] if lines else ""


def main() -> None:
    run(["synth", DATA])
    results = {}
    for cores in PAIR:
        results[cores] = json.loads(run([str(cores), DATA, "3"]))
        print(f"cores={cores}: "
              f"{results[cores]['rows_per_sec']:,.0f} rows/s", flush=True)
    lo, hi = results[PAIR[0]], results[PAIR[1]]
    eff = (hi["rows_per_sec"] / lo["rows_per_sec"]) / (PAIR[1] / PAIR[0])
    out = {"pair": {"N": PAIR[0], "4N": PAIR[1],
                    "rows_per_sec_N": lo["rows_per_sec"],
                    "rows_per_sec_4N": hi["rows_per_sec"],
                    "scaling_efficiency": round(eff, 3)},
           "raw": results}
    with open("/root/repo/BENCH_scaling_asof.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out["pair"]))


if __name__ == "__main__":
    main()
