#!/usr/bin/env bash
set -euo pipefail
cd "$(dirname "$0")/.."
echo "== pytest (CPU, virtual 8-device mesh) =="
python -m pytest tests/ -x -q
echo "== dryrun_multichip(8) =="
python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"
if [[ "${1:-}" == "--with-tpu" ]]; then
  echo "== bench.py (real device) =="
  python bench.py
  echo "== entry() compile check (real device) =="
  python __graft_entry__.py
  echo "== dress rehearsal (on-disk dataset -> train/eval/video CLIs) =="
  scripts/dress_rehearsal.sh
fi
echo "ALL CHECKS PASSED"
