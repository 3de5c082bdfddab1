#!/bin/bash
# Round-3 physics campaign: sequential jobs, one CPU core (nice'd so probes,
# tests and chip work keep priority).  All measurements at the production
# convention (N+1 block, chi x2 — run_ite defaults), so best-store records
# are convention-correct.
cd "$(dirname "$0")/.."
set -x
mkdir -p logs data/runs

# 1. D=3 from the round-3 D=2 record (-0.40239, q0- basin) padded up.
nice -n 10 python -u scripts/run_ite.py -D 3 -N 2 --platform cpu \
  --cell pad:2 --seed 0 --dt-start 1e-3 --dt-stop 1e-6 --steps-per-dt 30 \
  --use-lowest-energy-state --measure-every 4 --out data/runs/D3_pad_r3 \
  > logs/ite_D3_pad_r3.log 2>&1

# 2. First D=4 record: best D=3 padded up.
nice -n 10 python -u scripts/run_ite.py -D 4 -N 2 --platform cpu \
  --cell pad:3 --seed 0 --dt-start 1e-3 --dt-stop 1e-5 --steps-per-dt 20 \
  --use-lowest-energy-state --measure-every 5 --out data/runs/D4_pad_r3 \
  > logs/ite_D4_pad_r3.log 2>&1

# 3. First D=5 record: best D=4 padded up (short ladder; CPU-bound).
nice -n 10 python -u scripts/run_ite.py -D 5 -N 2 --platform cpu \
  --cell pad:4 --seed 0 --dt-start 1e-3 --dt-stop 1e-4 --steps-per-dt 15 \
  --use-lowest-energy-state --measure-every 8 --mode-reps 3 \
  --out data/runs/D5_pad_r3 \
  > logs/ite_D5_pad_r3.log 2>&1
