#!/usr/bin/env bash
# Steal-gated board runner: waits for a quiet hypervisor window (direct
# /proc/stat steal probe), runs one Bench board, and retries when the
# board's own sentinels flag the window (steal_flagged / io_flagged) —
# the r16 host shows neighbor-steal waves of 20-95% of demanded CPU
# lasting minutes, so un-gated boards are routinely unusable.
# Usage: SPARK_GRAFT_*=... tools/quiet_bench.sh <out.json> [maxTries]
set -uo pipefail
cd "$(dirname "$0")/.."
OUT="$1"; MAX="${2:-5}"
probe_quiet() { # 6s sample; quiet = <1% steal of capacity and low absolute
  python3 - <<'EOF'
import time, sys
def t():
    return list(map(int, open('/proc/stat').readline().split()[1:]))
a = t(); time.sleep(6); b = t()
d = [y - x for x, y in zip(a, b)]
sys.exit(0 if d[7] <= 10 else 1)   # <=10 stolen ticks in 6s
EOF
}
for i in $(seq 1 "$MAX"); do
  until probe_quiet; do echo "[quiet_bench] steal wave, waiting..."; sleep 20; done
  SPARK_GRAFT_BENCH_OUT="$OUT" tools/run_bench.sh graft.Bench >/dev/null 2>&1
  if python3 -c "
import json, sys
b = json.load(open('$OUT'))
bad = b.get('steal_flagged') or b.get('io_flagged') or b.get('noisy') or b.get('errors')
sys.exit(1 if bad else 0)"; then
    echo "[quiet_bench] clean board after $i attempt(s): $OUT"; exit 0
  fi
  echo "[quiet_bench] board self-flagged (attempt $i), retrying"
done
echo "[quiet_bench] no clean board in $MAX attempts; last board kept: $OUT"
exit 2
