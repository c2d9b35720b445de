#!/bin/bash
# Round-5 training-seed bands (VERDICT #2): the wrf bullseye headline
# (76.8 +- 1.2, eval-seed band on ONE round-3 training run) vs round 4's
# fresh ip02 retrain (68.6).  Hypothesis from the ledger: the recipes
# DIFFER — r3s_wrf had NO --inplume-bonus; wrf_ip02 has 0.2 (adopted for
# the r50-protocol contact win).  This runbook measures BOTH recipes at
# >=3 training seeds, both protocols, so the headline can quote an honest
# multi-train-seed band and the drift question is settled by construction.
# Sequential on the real TPU — never overlap two compiles on the tunnel.
set -xe
R=/root/runs
mkdir -p $R
trap 'echo FAILED > $R/seedband.failed' ERR
cd /root/repo
REC="--preset wrf_les --reward delta --obs-memory --envs 512 --unroll 64 --minibatch 4096 --lr 1e-4 --no-csv --episodes 400000"

# 60 s pause between clients: starting a NEW program's compile while the
# previous client's device queue is still draining wedged the tunnel
# permanently once this round (wrf_nb_s0, 35 min at zero CPU — the
# CLAUDE.md brand-new-program-mid-queue trap, across processes).
for s in 0 1 2; do
  if [ ! -d $R/wrf_ip02_s$s/checkpoint ]; then
    python -m tpu_plume.cli train $REC --inplume-bonus 0.2 --seed $s \
      --out $R/wrf_ip02_s$s > $R/sb_train_ip02_s$s.log 2>&1
    sleep 60
  fi
  if [ ! -d $R/wrf_nb_s$s/checkpoint ]; then
    python -m tpu_plume.cli train $REC --seed $s \
      --out $R/wrf_nb_s$s > $R/sb_train_nb_s$s.log 2>&1
    sleep 60
  fi
done
for s in 0 1 2; do
  python scripts/ride_ab.py $R/wrf_ip02_s$s/checkpoint 1000 0 control \
    > $R/sb_eval_ip02_s$s.log 2>&1
  python scripts/ride_ab.py $R/wrf_nb_s$s/checkpoint 1000 0 control \
    > $R/sb_eval_nb_s$s.log 2>&1
done
echo DONE > $R/seedband.done
