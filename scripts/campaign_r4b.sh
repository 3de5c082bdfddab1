#!/bin/bash
# Round-4 physics queue v2: mixed precision (c64 BP+ITE segments, f64
# measurements — run_ite --optimize-dtype) replaces the x64-everywhere
# campaign that was compile-wall-bound (~5 h per 5-segment block at D=4).
# Strictly sequential, nice'd, one CPU core. PID file: /tmp/campaign_r4b.pid.
cd "$(dirname "$0")/.."
set -x
echo $$ > /tmp/campaign_r4b.pid
mkdir -p logs data/runs

# 0. Mixed-precision validation (VERDICT #5 done-criterion): warm start from
#    the D=3 best, tiny dt so the state stays put; the f64-measured energy
#    must reproduce the measurement pin (-0.4068981507) to <=1e-6.
nice -n 10 python -u scripts/run_ite.py -D 3 -N 2 --platform cpu \
  --cell best --optimize-dtype complex64 --dt-start 1e-7 --dt-stop 1e-7 \
  --steps 2 --measure-every 1 --no-best-store \
  --out data/runs/D3_mixed_validate > logs/mixed_validate_D3.log 2>&1
grep "energy/site" logs/mixed_validate_D3.log | tail -2

# 1. Large-D capability demos (VERDICT #1): D=6 then D=8, one BP convergence
#    + one ITE edge update each, single-layer auto-on, peak RSS recorded.
nice -n 10 timeout 7200 python -u tools/large_d_demo.py 6 \
  > logs/large_d_demo_6.log 2>&1
nice -n 10 timeout 14400 python -u tools/large_d_demo.py 8 \
  > logs/large_d_demo_8.log 2>&1

# 2. D=2 depth: fine ladder from the D=2 best toward the reference -0.40464.
nice -n 10 python -u scripts/run_ite.py -D 2 -N 2 --platform cpu \
  --cell best --optimize-dtype complex64 --seed 1 \
  --dt-start 1e-4 --dt-stop 1e-7 --steps-per-dt 80 \
  --use-lowest-energy-state --measure-every 8 \
  --out data/runs/D2_deep_r4 > logs/ite_D2_deep_r4.log 2>&1

# 3. D=3: re-anneal from the (new) D=2 best padded up, full ladder.
nice -n 10 python -u scripts/run_ite.py -D 3 -N 2 --platform cpu \
  --cell pad:2 --optimize-dtype complex64 --seed 2 \
  --dt-start 1e-3 --dt-stop 1e-6 --steps-per-dt 40 --mode-reps 3 \
  --use-lowest-energy-state --measure-every 6 \
  --out data/runs/D3_deep_r4 > logs/ite_D3_deep_r4.log 2>&1

# 4. D=4: pad from the (new) D=3 best.
nice -n 10 python -u scripts/run_ite.py -D 4 -N 2 --platform cpu \
  --cell pad:3 --optimize-dtype complex64 --seed 0 \
  --dt-start 1e-3 --dt-stop 1e-5 --steps-per-dt 25 --mode-reps 3 \
  --use-lowest-energy-state --measure-every 5 \
  --out data/runs/D4_r4b > logs/ite_D4_r4b.log 2>&1

# 5. First D=5 record: seed the record book from the D=4 best, then ITE.
nice -n 10 python -u scripts/measure_padded.py -D 5 \
  > logs/measure_padded_D5.log 2>&1
nice -n 10 python -u scripts/run_ite.py -D 5 -N 2 --platform cpu \
  --cell pad:4 --optimize-dtype complex64 --seed 0 \
  --dt-start 1e-3 --dt-stop 1e-4 --steps-per-dt 15 --mode-reps 3 \
  --use-lowest-energy-state --measure-every 5 \
  --out data/runs/D5_r4b > logs/ite_D5_r4b.log 2>&1

rm -f /tmp/campaign_r4b.pid
