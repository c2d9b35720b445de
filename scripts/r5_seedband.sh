#!/bin/bash
# Round-5 training-seed bands (VERDICT #2): the wrf bullseye headline
# (76.8 +- 1.2, eval-seed band on ONE round-3 training run) vs round 4's
# fresh ip02 retrain (68.6).  Hypothesis from the ledger: the recipes
# DIFFER — r3s_wrf had NO --inplume-bonus; wrf_ip02 has 0.2 (adopted for
# the r50-protocol contact win).  This runbook measures BOTH recipes at
# >=3 training seeds, both protocols, so the headline can quote an honest
# multi-train-seed band and the drift question is settled by construction.
#
# Sequential on the real TPU; every client is wrapped in timeout+retry —
# the axon tunnel wedged twice this session on back-to-back clients
# (identical cached programs, ~0 CPU for 12-35 min), and a killed client
# needs ~5 min of tunnel recovery before the retry (CLAUDE.md).
set -x
R=/root/runs
mkdir -p $R
cd /root/repo
REC="--preset wrf_les --reward delta --obs-memory --envs 512 --unroll 64 --minibatch 4096 --lr 1e-4 --no-csv --episodes 400000"

tpu_job() {  # tpu_job <logfile> <cmd...>
  log=$1; shift
  for a in 1 2 3; do
    timeout 1500 "$@" > "$log" 2>&1 && return 0
    echo "RETRY $a after wedge/fail: $*" >> "$log"
    sleep 300
  done
  echo FAILED > $R/seedband.failed
  return 1
}

for s in 0 1 2; do
  if [ ! -d $R/wrf_ip02_s$s/checkpoint ]; then
    tpu_job $R/sb_train_ip02_s$s.log \
      python -m tpu_plume.cli train $REC --inplume-bonus 0.2 --seed $s \
      --out $R/wrf_ip02_s$s || exit 1
    sleep 30
  fi
  if [ ! -d $R/wrf_nb_s$s/checkpoint ]; then
    tpu_job $R/sb_train_nb_s$s.log \
      python -m tpu_plume.cli train $REC --seed $s \
      --out $R/wrf_nb_s$s || exit 1
    sleep 30
  fi
done
for s in 0 1 2; do
  [ -s $R/sb_eval_ip02_s$s.log ] && grep -q bullseye $R/sb_eval_ip02_s$s.log || \
    tpu_job $R/sb_eval_ip02_s$s.log \
      python scripts/ride_ab.py $R/wrf_ip02_s$s/checkpoint 1000 0 control \
      || exit 1
  sleep 30
  [ -s $R/sb_eval_nb_s$s.log ] && grep -q bullseye $R/sb_eval_nb_s$s.log || \
    tpu_job $R/sb_eval_nb_s$s.log \
      python scripts/ride_ab.py $R/wrf_nb_s$s/checkpoint 1000 0 control \
      || exit 1
  sleep 30
done
echo DONE > $R/seedband.done
