#!/bin/bash
# K=16 3-D bank contact-shaping A/B: baseline vs --inplume-bonus 0.2,
# each with a distribution-matched localizer for --guide learned.
set -x
R=/root/runs
REC="--preset wrf_les_3d --reward delta --obs-memory --envs 512 --unroll 64 --minibatch 4096 --lr 1e-4 --synth-bank 3d --bank-fields 16"
cd /root/repo

for arm in base ip; do
  BONUS=""
  [ "$arm" = ip ] && BONUS="--inplume-bonus 0.2"
  python -m tpu_plume.cli train $REC $BONUS --seed 0 --episodes 600000 --no-csv --out $R/k16_$arm > $R/k16_${arm}_train.log 2>&1
  python -m tpu_plume.cli eval $REC --ckpt $R/k16_$arm/checkpoint --episodes 1000 --seed 0 > $R/k16_${arm}_plain.log 2>&1
  python -m tpu_plume.cli eval $REC --ckpt $R/k16_$arm/checkpoint --episodes 2000 --seed 3 --save-flights $R/k16_${arm}_fl.npz > $R/k16_${arm}_collect.log 2>&1
  python -m tpu_plume.cli train-lstm --variant params --flights $R/k16_${arm}_fl.npz --out $R/k16_${arm}_loc > $R/k16_${arm}_loctrain.log 2>&1
  python -m tpu_plume.cli eval $REC --ckpt $R/k16_$arm/checkpoint --episodes 1000 --seed 0 --guide learned --guide-ckpt $R/k16_${arm}_loc/gaussian_params --guide-stable-tol 24 > $R/k16_${arm}_guided.log 2>&1
done
echo DONE > $R/k16.done
