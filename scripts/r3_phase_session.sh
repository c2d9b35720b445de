#!/bin/bash
# Round-3 phase-control arms, self-contained for a fresh container (all
# /root/runs checkpoints from earlier sessions are gone, so the control
# anchor is retrained first and the fine-tune arm starts from it).
#
# Context (RESULTS.md round 3): the oracle study measured the success@40
# headroom — staircase chemotaxis 42% vs approach-phase control 85% — and
# the CPU imitation studies showed feedforward policies cannot exceed the
# staircase by imitation (off-path direction is unobservable without
# memory).  The decisive arms are distilled PPO: on-policy oracle labels
# composed with the RL loss (--distill), optionally gated to the in-plume
# zone (--distill-gate) and composed with the success-gated terminal bonus
# (--terminal-gate 40).  Arms run SEQUENTIALLY — never overlap two big
# compiles on the tunnel.
#
# Usage: bash scripts/r3_phase_session.sh [episodes]
set -e
cd "$(dirname "$0")/.."
EPS=${1:-300000}
RECIPE="--preset ppo_v2_0 --reward delta --obs-memory --envs 512 --unroll 64 --minibatch 4096 --lr 1e-4 --seed 0 --no-csv"
EVAL="--preset ppo_v2_0 --obs-memory --reward delta --episodes 1000 --seed 0"
R=/root/runs
mkdir -p $R

run_eval () {  # $1 ckpt dir, $2 tag, extra args after
  local ckpt=$1 tag=$2; shift 2
  python -m tpu_plume.cli eval $EVAL --ckpt "$ckpt" "$@" 2>&1 | tee $R/eval_$tag.log
}

echo "=== arm C: control retrain (r2_delta2 recipe, $EPS episodes)"
python -m tpu_plume.cli train $RECIPE --episodes $EPS --out $R/r3s_control
run_eval $R/r3s_control/checkpoint control

echo "=== arm D1: distilled PPO (phase teacher, coef 0.1, terminal-gate 40)"
python -m tpu_plume.cli train $RECIPE --episodes $EPS \
    --distill phase --distill-coef 0.1 --terminal-gate 40 \
    --out $R/r3s_distill
run_eval $R/r3s_distill/checkpoint distill

echo "=== arm D2: distilled + in-plume gate 0.03 (skip far-field mimicry)"
python -m tpu_plume.cli train $RECIPE --episodes $EPS \
    --distill phase --distill-coef 0.1 --distill-gate 0.03 --terminal-gate 40 \
    --out $R/r3s_distill_gate
run_eval $R/r3s_distill_gate/checkpoint distill_gate

echo "=== arm D0: distilled FINE-TUNE of the fresh control"
python -m tpu_plume.cli train $RECIPE --episodes 100000 \
    --ckpt $R/r3s_control/checkpoint \
    --distill phase --distill-coef 0.1 --distill-gate 0.01 \
    --terminal-gate 40 --min-radius 50 --out $R/r3s_distill_ft
run_eval $R/r3s_distill_ft/checkpoint distill_ft

echo "=== arm D4: distill-then-anneal (bootstrap 200k, endgame 100k)"
python -m tpu_plume.cli train $RECIPE --episodes 200000 \
    --distill phase --distill-coef 0.1 --distill-gate 0.01 \
    --terminal-gate 40 --out $R/r3s_distill_boot
python -m tpu_plume.cli train $RECIPE --episodes 100000 \
    --ckpt $R/r3s_distill_boot/checkpoint --terminal-gate 40 \
    --out $R/r3s_distill_endgame
run_eval $R/r3s_distill_endgame/checkpoint distill_endgame

echo "=== arm D3: distilled RECURRENT PPO (LN-LSTM + phase teacher, in-plume gate)"
python -m tpu_plume.cli train $RECIPE --episodes $EPS \
    --arch lstm --ln-lstm --distill phase --distill-coef 0.1 \
    --distill-gate 0.01 --terminal-gate 40 --out $R/r3s_distill_lstm
run_eval $R/r3s_distill_lstm/checkpoint distill_lstm --arch lstm --ln-lstm

echo "=== ALL ARMS DONE"
