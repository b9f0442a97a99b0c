#!/usr/bin/env bash
# One-command verification gate: everything the driver checks, locally.
#   bash tools/gate.sh           # pytest + contract (sf0.01) + sweeps
#   bash tools/gate.sh full      # + contract at sf0.001 and sf0.1
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== pytest =="
python -m pytest tests/ -q

echo "== contract (sf0.01) =="
python tools/check_contract.py

if [[ "${1:-}" == "full" ]]; then
  for sf in sf0.001 sf0.1; do
    echo "== contract ($sf) =="
    python - <<EOF
import sys
sys.path.insert(0, "tools"); sys.path.insert(0, ".")
import check_contract
fails = check_contract.main(sf_dir="/root/testdata/$sf")
sys.exit(1 if fails else 0)
EOF
  done
fi

echo "== control-char sweep =="
! grep -rP '[\x00-\x08\x0b\x0c\x0e-\x1f]' \
    mms_rdf_spark/ tests/ tools/ __spark_entry__.py bench.py
echo "== gate PASS =="
