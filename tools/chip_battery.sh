#!/bin/bash
# Chip evidence battery (VERDICT r2 #1/#3/#4): probe axon, and on recovery
# run the whole chip suite, logging everything under logs/chip/.
# Guarded by a PID file so periodic schedulers can fire it blindly.
set -u
cd "$(dirname "$0")/.."
mkdir -p logs/chip
STAMP=$(date +%Y%m%d-%H%M%S)
PIDFILE=/tmp/chip_battery.pid

if [ -f "$PIDFILE" ] && kill -0 "$(cat $PIDFILE)" 2>/dev/null; then
  echo "battery already running (pid $(cat $PIDFILE))"; exit 0
fi
echo $$ > "$PIDFILE"

log() { echo "$(date +%H:%M:%S) $*" | tee -a "logs/chip/battery_$STAMP.log"; }

log "probe..."
if ! timeout 180 python -u tools/probe_axon.py >> "logs/chip/battery_$STAMP.log" 2>&1; then
  log "axon DOWN — stopping"
  rm -f "$PIDFILE"; exit 1
fi
log "axon UP — running battery"

log "[0/4] probe_eager_ops (per-op capability map)"
timeout 1200 python -u tools/probe_eager_ops.py > "logs/chip/eager_ops_$STAMP.log" 2>&1
log "eager_ops exit=$?"
grep '^{' "logs/chip/eager_ops_$STAMP.log" | tail -13 >> "logs/chip/battery_$STAMP.log"

log "[1/4] probe_bp_programs (split-program policy check)"
KPBP_STAGE_ALARM=900 timeout 3600 python -u tools/probe_bp_programs.py > "logs/chip/bp_programs_$STAMP.log" 2>&1
log "bp_programs exit=$?"

log "[2/4] bench.py (extended budget: eager-tier TPU measurement is slow but real)"
KPBP_BENCH_TIMEOUT=1500 timeout 2100 python -u bench.py > "logs/chip/bench_$STAMP.log" 2>&1
log "bench exit=$? : $(grep -h '^{' logs/chip/bench_$STAMP.log | tail -1)"

log "[3/4] chip_accuracy D=3 N=2"
timeout 3600 python -u tools/chip_accuracy.py 3 2 > "logs/chip/accuracy_$STAMP.log" 2>&1
log "accuracy exit=$? : $(grep -h '^{' logs/chip/accuracy_$STAMP.log | tail -1)"

log "[4/4] bench_scaling D=4..8"
timeout 7200 python -u tools/bench_scaling.py 4 5 6 7 8 > "logs/chip/scaling_$STAMP.log" 2>&1
log "scaling exit=$?"
cat "logs/chip/scaling_$STAMP.log" >> "logs/chip/battery_$STAMP.log"

log "[5/6] gram-linalg A/B (CholeskyQR2 + eigh-SVD vs Householder/Jacobi)"
KPBP_LINALG=gram timeout 3600 python -u tools/bench_scaling.py 4 5 6 > "logs/chip/scaling_gram_$STAMP.log" 2>&1
log "gram scaling exit=$?"
cat "logs/chip/scaling_gram_$STAMP.log" >> "logs/chip/battery_$STAMP.log"

log "[6/6] pallas chol+inv kernel microbench (vs XLA cholesky+solve)"
timeout 1200 python -u tools/bench_chol_kernel.py > "logs/chip/chol_kernel_$STAMP.log" 2>&1
log "chol kernel exit=$? : $(grep -h '^{' logs/chip/chol_kernel_$STAMP.log | tail -1)"

log "[7/7] chi-shard mesh scaling (runs the GSPMD sharded sweep over every chip present; 1 row on a single-chip host)"
NCHIPS=$(timeout 300 python -u -c "import jax; print(len(jax.devices()))" 2>/dev/null || echo 1)
timeout 2400 python -u tools/chi_shard_scaling.py --platform axon --D 4 --chi 32 \
  --devices 1 $([ "$NCHIPS" -ge 2 ] && echo 2) $([ "$NCHIPS" -ge 4 ] && echo 4) $([ "$NCHIPS" -ge 8 ] && echo 8) \
  > "logs/chip/chi_shard_$STAMP.log" 2>&1
log "chi_shard exit=$? : $(tail -2 logs/chip/chi_shard_$STAMP.log | head -1)"

log "battery done"
rm -f "$PIDFILE"
