#!/usr/bin/env bash
# Round-end checklist: everything that must be green before the driver's
# verify/judge pass. Run from the repo root:
#
#   bash tools/round_checklist.sh
#
# 1. full pytest suite (unit + property + plan-quality + oracle diff)
# 2. driver simulation from a plain session, cwd OUTSIDE the repo
#    (exercises tune_session self-shipping; see .claude/skills/verify)
# 3. bench + regression canary vs the last committed local bench
#    (hardware-normalized via cal_spin_sec)
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== 1/3 pytest =="
python -m pytest tests/ -q

echo "== 2/3 driver simulation =="
if [ ! -f /tmp/drive_entry.py ]; then
    echo "regenerate /tmp/drive_entry.py per .claude/skills/verify/SKILL.md" >&2
    exit 1
fi
(cd /tmp && timeout 900 python /tmp/drive_entry.py | tail -2)

echo "== 3/3 bench canary =="
python tools/bench_canary.py

echo "ROUND CHECKLIST: ALL GREEN"
