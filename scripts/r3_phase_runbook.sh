#!/bin/bash
# Round-3 phase-control experiment runbook (runs on the real TPU).
#
# Context: the oracle-ceiling study (scripts/oracle_ceiling.py) measured the
# success@40 headroom — staircase 42% vs phase-control 85% — and the
# CPU-scale studies (RESULTS.md round 3) showed BC collapses closed-loop,
# feedforward DAgger plateaus at ~30% (off-path direction is obs-
# uninferable), leaving two live routes: distilled PPO (on-policy oracle
# labels composed with the RL loss) and sequence DAgger / distilled
# recurrent PPO.  This script runs the TPU-scale arms sequentially (never
# overlap two compiles on the tunnel!).
#
# Usage: bash scripts/r3_phase_runbook.sh [flagship_episodes]
set -e
cd "$(dirname "$0")/.."
EPS=${1:-300000}
RECIPE="--preset ppo_v2_0 --reward delta --obs-memory --envs 512 --unroll 64 --minibatch 4096 --lr 1e-4 --seed 0 --no-csv"

echo "=== arm D0: distilled FINE-TUNE of the historical best (r2_delta2, 46.4%)"
if [ -d /root/runs/r2_delta2/checkpoint ]; then
python -m tpu_plume.cli train $RECIPE --episodes 100000 \
    --ckpt /root/runs/r2_delta2/checkpoint \
    --distill phase --distill-coef 0.1 --distill-gate 0.01 \
    --terminal-gate 40 --min-radius 50 --out runs/r3_distill_ft
python -m tpu_plume.cli eval --preset ppo_v2_0 --obs-memory --reward delta \
    --ckpt runs/r3_distill_ft/checkpoint --episodes 1000 --seed 0
fi

echo "=== arm D1: distilled PPO (phase teacher, coef 0.1, gate+curriculum)"
python -m tpu_plume.cli train $RECIPE --episodes $EPS \
    --distill phase --distill-coef 0.1 --terminal-gate 40 \
    --out runs/r3_distill

echo "=== eval D1 (reference protocol, 1000 greedy episodes)"
python -m tpu_plume.cli eval --preset ppo_v2_0 --obs-memory --reward delta \
    --ckpt runs/r3_distill/checkpoint --episodes 1000 --seed 0

echo "=== arm D2: distilled + conc gate 0.03 (skip far-field mimicry)"
python -m tpu_plume.cli train $RECIPE --episodes $EPS \
    --distill phase --distill-coef 0.1 --distill-gate 0.03 --terminal-gate 40 \
    --out runs/r3_distill_gate
python -m tpu_plume.cli eval --preset ppo_v2_0 --obs-memory --reward delta \
    --ckpt runs/r3_distill_gate/checkpoint --episodes 1000 --seed 0

echo "=== arm D3: distilled RECURRENT PPO (LN-LSTM + phase teacher, in-plume gate)"
# The phase-control zone (d in (50, 100), conc_norm 0.01-0.28 at sigma
# 31.25) is fully obs-inferable WITH memory: gate the imitation there and
# let RL own the far-field search.
python -m tpu_plume.cli train $RECIPE --episodes $EPS \
    --arch lstm --ln-lstm --distill phase --distill-coef 0.1 \
    --distill-gate 0.01 --terminal-gate 40 --out runs/r3_distill_lstm
python -m tpu_plume.cli eval --preset ppo_v2_0 --obs-memory --reward delta \
    --arch lstm --ln-lstm --ckpt runs/r3_distill_lstm/checkpoint \
    --episodes 1000 --seed 0

echo "=== arm D4: distill-then-anneal (two-run composition, GAIL-study recipe)"
python -m tpu_plume.cli train $RECIPE --episodes 200000 \
    --distill phase --distill-coef 0.1 --distill-gate 0.01 \
    --terminal-gate 40 --out runs/r3_distill_boot
python -m tpu_plume.cli train $RECIPE --episodes 100000 \
    --ckpt runs/r3_distill_boot/checkpoint --terminal-gate 40 \
    --out runs/r3_distill_endgame
python -m tpu_plume.cli eval --preset ppo_v2_0 --obs-memory --reward delta \
    --ckpt runs/r3_distill_endgame/checkpoint --episodes 1000 --seed 0

echo "=== arm S1: sequence DAgger at TPU scale (if CPU run was truncated)"
python -m tpu_plume.cli train-dagger --preset ppo_v2_0 --obs-memory \
    --arch lstm --ln-lstm --rounds 12 --envs 512 --bc-epochs 15 --seed 0 \
    --out runs/r3_sdagger_tpu
python -m tpu_plume.cli eval --preset ppo_v2_0 --obs-memory \
    --arch lstm --ln-lstm --ckpt runs/r3_sdagger_tpu/checkpoint \
    --episodes 1000 --seed 0

echo "=== done; record results in RESULTS.md"
