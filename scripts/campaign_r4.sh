#!/bin/bash
# Round-3 (cont.) physics queue: strictly sequential, one CPU core, nice'd
# so chip probes/battery keep priority.  Waits for an already-running
# measure_padded D=4 (pid file) before starting.
# All runs at the production convention (N+1 block, chi x2).
cd "$(dirname "$0")/.."
set -x
mkdir -p logs data/runs

# 0. wait for the in-flight D=4 padded measurement (seeds the D=4 record)
if [ -f /tmp/measure_d4.pid ]; then
  while kill -0 "$(cat /tmp/measure_d4.pid)" 2>/dev/null; do sleep 60; done
fi

# 1. First D=4 ITE record: best D=3 padded up (cache now warm from step 0).
nice -n 10 python -u scripts/run_ite.py -D 4 -N 2 --platform cpu \
  --cell pad:3 --seed 0 --dt-start 1e-3 --dt-stop 1e-5 --steps-per-dt 20 \
  --use-lowest-energy-state --measure-every 5 --out data/runs/D4_pad_r4 \
  > logs/ite_D4_pad_r4.log 2>&1

# 2. Seed the D=5 record book from the (post-ITE) D=4 best.
nice -n 10 python -u scripts/measure_padded.py -D 5 \
  > logs/measure_padded_D5.log 2>&1

# 3. First D=5 ITE record (short ladder; CPU-bound).
nice -n 10 python -u scripts/run_ite.py -D 5 -N 2 --platform cpu \
  --cell pad:4 --seed 0 --dt-start 1e-3 --dt-stop 1e-4 --steps-per-dt 12 \
  --use-lowest-energy-state --measure-every 8 --mode-reps 3 \
  --out data/runs/D5_pad_r4 \
  > logs/ite_D5_pad_r4.log 2>&1

# 4. D=2 depth: warm start from the best D=2, long fine ladder toward the
#    reference's -0.40464.
nice -n 10 python -u scripts/run_ite.py -D 2 -N 2 --platform cpu \
  --cell best --seed 1 --dt-start 1e-4 --dt-stop 1e-7 --steps-per-dt 80 \
  --use-lowest-energy-state --measure-every 4 --out data/runs/D2_deep_r4 \
  > logs/ite_D2_deep_r4.log 2>&1

# 5. D=3 depth: warm start from best D=3, fine ladder.
nice -n 10 python -u scripts/run_ite.py -D 3 -N 2 --platform cpu \
  --cell best --seed 1 --dt-start 1e-4 --dt-stop 1e-6 --steps-per-dt 50 \
  --use-lowest-energy-state --measure-every 4 --out data/runs/D3_deep_r4 \
  > logs/ite_D3_deep_r4.log 2>&1
