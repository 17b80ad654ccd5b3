#!/usr/bin/env bash
# Slow-tier run of record: run the heavy end-to-end test tier and append a
# dated one-line summary to scripts/slow_tier_run_of_record.log.
#
# The fast tier (~5 min, `python -m pytest tests/ -q`) runs anywhere; the
# slow tier holds the crown jewels (quality gate on TPU, 2-process
# distributed training, full-geometry oracle parity, bench integration) and
# takes tens of minutes on this repo's 1-CPU CI host — so instead of gating
# every change on it, this script produces an auditable dated record.
# Refresh it on a TPU-bearing host whenever slow tests change (README:
# "Tests" section).
#
# usage: scripts/run_slow_tier.sh [extra pytest args...]
set -uo pipefail
cd "$(dirname "$0")/.."
LOG=scripts/slow_tier_run_of_record.log
TMP=$(mktemp)
# Bounded backend identification (a live jax.devices() probe could hang on
# a wedged tunnel; doctor never does).
ACCEL=$(python -m stabnet_tpu.cli.main doctor --only backend --timeout 120 \
        --compact 2>/dev/null \
        | python -c "import json,sys; print(json.load(sys.stdin)['checks']['backend'].get('platform','unavailable'))" \
        2>/dev/null || echo unknown)
python -m pytest tests/ -m slow -q "$@" 2>&1 | tee "$TMP"
RC=${PIPESTATUS[0]}
SUMMARY=$(grep -E '^[0-9]+ (passed|failed)|passed|failed|error' "$TMP" | tail -1)
echo "$(date '+%F %T') | commit $(git rev-parse --short HEAD) | backend ${ACCEL} | rc=${RC} | ${SUMMARY}" >> "$LOG"
rm -f "$TMP"
exit "$RC"
