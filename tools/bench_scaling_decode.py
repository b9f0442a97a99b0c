"""Multimodal-decode scaling pair (operator-class breadth alongside
the official extraction pair): REAL PPM decode + channel stats via
Arrow mapInPandas at local[1] vs local[4] on the same 200k-image
input — the pair that measures the PYTHON-WORKER lane (the other pairs
cover codegen, windows, and regex). Writes BENCH_scaling_decode.json.
Run on a QUIET box only."""

from __future__ import annotations

import json
import subprocess
import sys

sys.path.insert(0, "/root/repo")

DATA = "/root/repo/build/media_scaling_decode"
PAIR = (1, 4)


def run(args: list[str]) -> str:
    out = subprocess.run([sys.executable,
                          "/root/repo/tools/scaling_worker_decode.py",
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
    with open("/root/repo/BENCH_scaling_decode.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out["pair"]))


if __name__ == "__main__":
    main()
