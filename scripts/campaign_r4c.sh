#!/bin/bash
# Round-4 physics queue v3 (post gram-split + escalation-cap fixes).
#
# Rationale: the reference's records come from ~700-segment ladders
# (dt=1e-2..1e-8 x100, 5 modes/segment — scripts/run_ite.py:240-244 +
# main.py defaults); round-3/4a runs used ~10x fewer updates because x64
# segments were compile-wall-bound. Mixed precision (c64 segments / f64
# measurements, validated to 1.6e-7 drift) makes reference-length ladders
# feasible on this one core: D=3 segment ~15 s -> ~3 h for 600 segments.
# Strictly sequential, nice'd. PID file: /tmp/campaign_r4c.pid.
cd "$(dirname "$0")/.."
set -x
echo $$ > /tmp/campaign_r4c.pid
mkdir -p logs data/runs

# 1. D=3 deep ladder from the current best (-0.40690; reference D=3 best
#    measures ~-0.4139 today): 5 modes/segment like the reference, long
#    1e-4..1e-7 tail where full-update gains live.
nice -n 10 python -u scripts/run_ite.py -D 3 -N 2 --platform cpu \
  --cell best --optimize-dtype complex64 --seed 7 \
  --dt-start 1e-3 --dt-stop 1e-7 --steps-per-dt 100 --mode-reps 5 \
  --use-lowest-energy-state --measure-every 10 \
  --out data/runs/D3_deep_r4c > logs/ite_D3_deep_r4c.log 2>&1

# 2. D=4 from the (possibly new) D=3 best padded up, medium ladder.
nice -n 10 python -u scripts/run_ite.py -D 4 -N 2 --platform cpu \
  --cell pad:3 --optimize-dtype complex64 --seed 0 \
  --dt-start 1e-3 --dt-stop 1e-6 --steps-per-dt 60 --mode-reps 5 \
  --use-lowest-energy-state --measure-every 10 \
  --out data/runs/D4_r4c > logs/ite_D4_r4c.log 2>&1

# 3. First D=5 record: seed the record book from the D=4 best, then a short
#    ITE polish.
nice -n 10 python -u scripts/measure_padded.py -D 5 \
  > logs/measure_padded_D5.log 2>&1
nice -n 10 python -u scripts/run_ite.py -D 5 -N 2 --platform cpu \
  --cell pad:4 --optimize-dtype complex64 --seed 0 \
  --dt-start 1e-3 --dt-stop 1e-4 --steps-per-dt 20 --mode-reps 3 \
  --use-lowest-energy-state --measure-every 5 \
  --out data/runs/D5_r4c > logs/ite_D5_r4c.log 2>&1

rm -f /tmp/campaign_r4c.pid
