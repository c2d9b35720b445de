#!/bin/bash
# Round-4 K=16 entry-dive arm: does the local entry rule (chord-to-dive
# conversion, no expiry) beat the full rim guard (75.8% @ K=16) on the
# bank size where guarding all balls does NOT tile the domain?
# Waits for the K=64 A/B (scripts/g64_entry_ab.sh) so TPU compiles never
# overlap.  Retrains grid16b with the identical recipe (fresh container).
set -xe
trap 'echo FAILED > $R/g16.failed' ERR
R=/root/runs
mkdir -p $R
# Wait for the K=64 A/B (bounded): proceed on g64.done OR g64.failed OR 4 h —
# the K=16 arm only needs non-overlapping TPU compiles, not g64's results.
for i in $(seq 720); do
  [ -f $R/g64.done ] && break
  [ -f $R/g64.failed ] && break
  sleep 20
done
REC="--preset wrf_les --plume-model gridded --synth-bank static --bank-fields 16 --reward delta --obs-memory --envs 512 --unroll 64 --minibatch 4096 --lr 1e-4"
cd /root/repo
python -m tpu_plume.cli train $REC --inplume-bonus 0.2 --seed 0 --episodes 400000 --no-csv --out $R/grid16b_s0 > $R/g16_train.log 2>&1
python -m tpu_plume.cli eval $REC --ckpt $R/grid16b_s0/checkpoint --episodes 1000 --seed 0 --guide bank > $R/g16_rimguard.log 2>&1
python -m tpu_plume.cli eval $REC --ckpt $R/grid16b_s0/checkpoint --episodes 1000 --seed 0 --guide bank --guide-entry-dive > $R/g16_entry.log 2>&1
echo DONE > $R/g16.done
