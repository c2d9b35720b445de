#!/bin/bash
# Round-5 model-mismatch robustness (VERDICT #3): train + evaluate the
# guide stack on the LES-surrogate bank (synthesize_les_bank — meandering
# intermittent-puff fields OUTSIDE the sigma_y=0.3x^0.71 family every
# estimator assumes).  The bank goes through export_bank_netcdf ->
# ingest_netcdf so the external-data path is exercised end-to-end.
# Waits for the seed-band runbook so TPU compiles never overlap.
set -xe
R=/root/runs
mkdir -p $R
trap 'echo FAILED > $R/les.failed' ERR
cd /root/repo
for i in $(seq 1080); do
  [ -f $R/seedband.done ] && break
  [ -f $R/seedband.failed ] && break
  sleep 20
done

python - <<'EOF'
import sys
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
import dataclasses
from tpu_plume.core import get_preset
from tpu_plume.fields import gridded
cfg = dataclasses.replace(get_preset("wrf_les").env, plume_model="gridded")
bank = gridded.synthesize_les_bank(jax.random.PRNGKey(0), cfg,
                                   num_fields=16, num_frames=16)
gridded.export_bank_netcdf(bank, "/root/runs/les_bank.nc")
print("exported", bank.conc.shape)
EOF

REC="--preset wrf_les --plume-model gridded --bank $R/les_bank.nc --reward delta --obs-memory --envs 512 --unroll 64 --minibatch 4096 --lr 1e-4"
if [ ! -d $R/les16_s0/checkpoint ]; then
  python -m tpu_plume.cli train $REC --inplume-bonus 0.2 --seed 0 \
    --episodes 400000 --no-csv --out $R/les16_s0 > $R/les_train.log 2>&1
  sleep 60
fi
python -m tpu_plume.cli eval $REC --ckpt $R/les16_s0/checkpoint \
  --episodes 1000 --seed 0 --save-flights $R/les_flights.npz \
  > $R/les_plain.log 2>&1
python -m tpu_plume.cli eval $REC --ckpt $R/les16_s0/checkpoint \
  --episodes 1000 --seed 0 --guide bank > $R/les_bankguide.log 2>&1
# learned-localizer fallback, trained on the LES flights (CPU)
python -m tpu_plume.cli train-lstm --variant params --cpu \
  --flights $R/les_flights.npz --window 64 --epochs 100 \
  --features xycd --hidden-size 64 --out $R/les_loc > $R/les_loc.log 2>&1
python -m tpu_plume.cli eval $REC --ckpt $R/les16_s0/checkpoint \
  --episodes 1000 --seed 0 --guide learned \
  --guide-ckpt $R/les_loc/gaussian_params > $R/les_learned.log 2>&1
echo DONE > $R/les.done
