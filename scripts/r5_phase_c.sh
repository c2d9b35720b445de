#!/bin/bash
# Round-5 phase C (waits for the LES runbook; TPU compiles serialized):
#   C1 — terminal precision under the mixed split (VERDICT #4):
#        wrf ip02 recipe trained with --bf16-update --f32-heads; ride_ab
#        control arm gives the r50 + radius-5 bullseye rows to compare
#        against f32 (51.4 / 68.6) and plain bf16-update (51.5 / 61.0).
#   C2 — policy-in-the-loop guided fine-tune (VERDICT #6): fresh iso
#        policy, guided-protocol baseline, then fine-tune WITH the guide
#        riding the training rollout (override-masked PPO) vs a no-guide
#        control fine-tune at the same extra budget; all arms evaluated
#        under the guided protocol (baseline band 65-66, truth ceiling
#        68.85).
set -xe
R=/root/runs
mkdir -p $R
trap 'echo FAILED > $R/phasec.failed' ERR
cd /root/repo
for i in $(seq 1080); do
  [ -f $R/les.done ] && break
  [ -f $R/les.failed ] && break
  sleep 20
done

WREC="--preset wrf_les --reward delta --obs-memory --envs 512 --unroll 64 --minibatch 4096 --lr 1e-4 --no-csv --episodes 400000"
if [ ! -d $R/wrf_ip02bfh_s0/checkpoint ]; then
  python -m tpu_plume.cli train $WREC --inplume-bonus 0.2 --seed 0 \
    --bf16-update --f32-heads --out $R/wrf_ip02bfh_s0 \
    > $R/c1_train.log 2>&1
  sleep 60
fi
python scripts/ride_ab.py $R/wrf_ip02bfh_s0/checkpoint 1000 0 control \
  > $R/c1_eval.log 2>&1

IREC="--preset ppo_v2_0 --reward delta --obs-memory --envs 512 --unroll 64 --minibatch 4096 --lr 1e-4 --no-csv"
if [ ! -d $R/iso_s0/checkpoint ]; then
  python -m tpu_plume.cli train $IREC --seed 0 --episodes 300000 \
    --out $R/iso_s0 > $R/c2_train.log 2>&1
  sleep 60
fi
python -m tpu_plume.cli eval --preset ppo_v2_0 --reward delta --obs-memory \
  --ckpt $R/iso_s0/checkpoint --episodes 1000 --seed 0 --guide fit \
  > $R/c2_base.log 2>&1
# guided fine-tune: protocol radius pinned, terminal bonus gated at the
# success distance, guide riding the rollout
python -m tpu_plume.cli train $IREC --seed 0 --episodes 100000 \
  --ckpt $R/iso_s0/checkpoint --train-guide fit --min-radius 50 \
  --terminal-gate 40 --out $R/iso_gft > $R/c2_gft_train.log 2>&1
sleep 60
# control: same extra budget, same protocol pins, NO guide
python -m tpu_plume.cli train $IREC --seed 0 --episodes 100000 \
  --ckpt $R/iso_s0/checkpoint --min-radius 50 --terminal-gate 40 \
  --out $R/iso_ctl > $R/c2_ctl_train.log 2>&1
sleep 60
python -m tpu_plume.cli eval --preset ppo_v2_0 --reward delta --obs-memory \
  --ckpt $R/iso_gft/checkpoint --episodes 1000 --seed 0 --guide fit \
  > $R/c2_gft_eval.log 2>&1
python -m tpu_plume.cli eval --preset ppo_v2_0 --reward delta --obs-memory \
  --ckpt $R/iso_ctl/checkpoint --episodes 1000 --seed 0 --guide fit \
  > $R/c2_ctl_eval.log 2>&1
echo DONE > $R/phasec.done
