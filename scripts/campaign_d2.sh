#!/bin/bash
# Round-3 D=2 basin campaign: sequential jobs, one CPU core.
cd "$(dirname "$0")/.."
set -x
nice -n 10 python -u scripts/run_ite.py -D 2 -N 2 --platform cpu \
  --cell q0- --seed 0 --dt-start 1e-2 --dt-stop 1e-6 --steps-per-dt 30 \
  --use-lowest-energy-state --out data/runs/D2_q0m \
  > logs/ite_D2_q0m.log 2>&1
nice -n 10 python -u scripts/run_ite.py -D 2 -N 2 --platform cpu \
  --hamiltonian AFM-T --cell q0 --seed 0 --dt-start 1e-2 --dt-stop 1e-6 --steps-per-dt 30 \
  --use-lowest-energy-state --out data/runs/D2_q0_afmt \
  > logs/ite_D2_q0_afmt.log 2>&1
nice -n 10 python -u scripts/run_ite.py -D 2 -N 2 --platform cpu \
  --cell su --seed 0 --dt-start 1e-3 --dt-stop 1e-6 --steps-per-dt 40 \
  --use-lowest-energy-state --out data/runs/D2_su \
  > logs/ite_D2_su.log 2>&1
