#!/bin/bash
# Detached chip-datum hunter (round 5): the axon poisoning flickers on
# minute scales (logs/chip/poison_series.jsonl: the same eager op passes
# 3/3 then fails 3/3 minutes apart), so a single bench attempt mid-round
# usually dies — but ~30 spaced attempts across a round will land inside a
# healthy window if one ever opens.  Runs the bench CHILD only (no parent
# CPU-fallback: that burns 420 s of the one core per attempt); the child
# persists any fresh jit or eager chip measurement into
# data/bench_last_good.json itself, which the driver's end-of-round
# bench.py then emits.
#
# Start: setsid nohup bash tools/chip_hunter.sh > logs/chip/hunter.log 2>&1 &
# Stop:  kill $(cat /tmp/chip_hunter.pid)
set -u
cd "$(dirname "$0")/.."
PIDFILE=/tmp/chip_hunter.pid
if [ -f "$PIDFILE" ] && [ "$(cat $PIDFILE)" != "$$" ] && kill -0 "$(cat $PIDFILE)" 2>/dev/null; then
  echo "hunter already running (pid $(cat $PIDFILE))"; exit 0
fi
echo $$ > "$PIDFILE"
POLL=${KPBP_HUNTER_POLL:-420}
DEADLINE=$(( $(date +%s) + ${KPBP_HUNTER_HOURS:-5} * 3600 ))

while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  ts=$(date +%H:%M:%S)
  line=$(KPBP_BENCH_CHILD=1 KPBP_BENCH_TIMEOUT=900 KPBP_JIT_RETRIES=4 \
         timeout 960 nice -n 5 python -u bench.py 2>>logs/chip/hunter_err.log \
         | grep '^{"metric"' | tail -1)
  if [ -n "$line" ]; then
    echo "$ts $line"
    case "$line" in
      *'"stale": true'*'"eager_now"'*) echo "$ts EAGER DATUM LANDED — continuing for a jit window";;
      *'"stale": true'*) ;;  # still nothing fresh
      *) echo "$ts FRESH CHIP RECORD LANDED — stopping"; break;;
    esac
  else
    echo "$ts attempt produced no JSON (hang/kill)"
  fi
  sleep "$POLL"
done
rm -f "$PIDFILE"
echo "hunter done"
