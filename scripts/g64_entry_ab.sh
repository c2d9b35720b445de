#!/bin/bash
# Round-4 K=64 entry-dive A/B (follow-up to the RESULTS.md guard_top study).
# The container is fresh each session, so the grid64b checkpoint is retrained
# with the identical recipe before the arms run.  Arms:
#   guardtop  — prior best K=64 recipe (defaults + --guide-guard-top 4)
#   entry     — the entry-dive rule (forbid shallow chords, convert ball
#               entries to phase dives; replaces the rim guard's deflection)
#   entry_m15 — entry rule + score-margin 1.5 (exact-identification variant)
set -xe
trap 'echo FAILED > $R/g64.failed' ERR
R=/root/runs
mkdir -p $R
REC="--preset wrf_les --plume-model gridded --synth-bank static --bank-fields 64 --reward delta --obs-memory --envs 512 --unroll 64 --minibatch 4096 --lr 1e-4"
cd /root/repo
python -m tpu_plume.cli train $REC --inplume-bonus 0.2 --seed 0 --episodes 400000 --no-csv --out $R/grid64b_s0 > $R/g64_train.log 2>&1
python -m tpu_plume.cli eval $REC --ckpt $R/grid64b_s0/checkpoint --episodes 1000 --seed 0 > $R/g64_plain.log 2>&1
python -m tpu_plume.cli eval $REC --ckpt $R/grid64b_s0/checkpoint --episodes 1000 --seed 0 --guide bank --guide-guard-top 4 > $R/g64_guardtop.log 2>&1
python -m tpu_plume.cli eval $REC --ckpt $R/grid64b_s0/checkpoint --episodes 1000 --seed 0 --guide bank --guide-entry-dive > $R/g64_entry.log 2>&1
python -m tpu_plume.cli eval $REC --ckpt $R/grid64b_s0/checkpoint --episodes 1000 --seed 0 --guide bank --guide-entry-dive --guide-margin 1.5 > $R/g64_entry_m15.log 2>&1
echo DONE > $R/g64.done
