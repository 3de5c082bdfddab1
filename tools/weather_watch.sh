#!/bin/bash
# Detached axon-weather watcher (VERDICT r2 weak #1: no recovery protocol).
# Every POLL seconds classify the backend (tools/probe_weather.py); append to
# logs/chip/weather.jsonl; when transfers work again (class GOOD or
# EAGER_TRANSFER) fire the full chip battery (self-guarded by its own
# pidfile, so repeated fires are cheap no-ops while one is running).
#
# Start:  nohup bash tools/weather_watch.sh & echo $! > /tmp/weather_watch.pid
# Stop:   kill $(cat /tmp/weather_watch.pid)
set -u
cd "$(dirname "$0")/.."
PIDFILE=/tmp/weather_watch.pid
if [ -f "$PIDFILE" ] && [ "$(cat $PIDFILE)" != "$$" ] && kill -0 "$(cat $PIDFILE)" 2>/dev/null; then
  echo "watcher already running (pid $(cat $PIDFILE))"; exit 0
fi
echo $$ > "$PIDFILE"
mkdir -p logs/chip
POLL=${KPBP_WEATHER_POLL:-1500}

# representative subset for the per-cycle poisoning time series: the three
# eager controls vs three jit sizes — the eager-vs-jit split is the key
# science (is the poisoning dispatch-path-dependent, not size-dependent?)
SAMPLE="eager_matmul_f32 eager_matmul_c64 eager_qr_c64 jit_matmul_f32 jit_chain6norm_c64 jit_qr_c64"

while true; do
  line=$(timeout 700 nice -n 10 python -u tools/probe_weather.py 2>/dev/null | tail -1)
  [ -z "$line" ] && line='{"class": "PROBE_FAILED"}'
  echo "$line" >> logs/chip/weather.jsonl
  cls=$(echo "$line" | sed -n 's/.*"class": *"\([A-Z_]*\)".*/\1/p')
  echo "$(date +%H:%M:%S) weather=$cls" >> logs/chip/weather_watch.log
  if [ "$cls" != "DOWN" ] && [ "$cls" != "PROBE_FAILED" ]; then
    KPBP_POISON_ATTEMPTS=1 timeout 1800 nice -n 10 python -u \
      tools/probe_poison_boundary.py $SAMPLE 2>/dev/null \
      >> logs/chip/poison_series.jsonl
  fi
  case "$cls" in
    GOOD|EAGER_TRANSFER|JIT_NO_TRANSFER)
      nice -n 10 bash tools/chip_battery.sh >> logs/chip/battery_fire.log 2>&1
      ;;
  esac
  sleep "$POLL"
done
