"""Offline calibration of the anisotropic Gauss-Newton fit against saved
flights (``eval --save-flights`` npz): sweeps the posterior-se gate and
reports gated source-error quantiles vs the true sources.

This is how AnisoGuideConfig.max_se's default was chosen (RESULTS.md
round 3: se<=4 selects ~26% of unguided wrf flights at 2.0 px median /
3.4 px mean error).

Usage: python scripts/aniso_calibrate.py [flights.npz] [n_flights]
"""
import sys

sys.path.insert(0, ".")

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tpu_plume.core.config import get_preset
from tpu_plume.evaluation.aniso_fit import AnisoGuideConfig, fit_aniso

FLIGHTS = sys.argv[1] if len(sys.argv) > 1 else "/root/runs/wrf_flights_s3.npz"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 500
K = 128  # ring-buffer size (match AnisoGuideConfig.buffer_size)

cfg = dataclasses.replace(
    get_preset("wrf_les").env, reward_variant="delta", obs_memory=True
)
gcfg = AnisoGuideConfig()
noise_mean = cfg.turbulence_intensity * (0.7978845608 + 0.1)

d = np.load(FLIGHTS)
traj, src = d["trajectories"], d["sources"]
N = min(N, len(traj))
pos_all = np.zeros((N, K, 2), np.float32)
cn_all = np.zeros((N, K), np.float32)
w_all = np.zeros((N, K), np.float32)
nav = []
for i in range(N):
    t = traj[i]
    ok = ~np.isnan(t[:, 0])
    cn = (t[ok, 2] - noise_mean) / cfg.conc_peak
    acc = (cn >= gcfg.conc_floor) & (cn <= gcfg.conc_ceil)
    p, c = t[ok, :2][acc], cn[acc]
    nav.append(len(c))
    if len(c) == 0:
        continue
    p, c = p[-K:], c[-K:]  # ring-buffer semantics: last K accepted
    pos_all[i, : len(c)] = p
    cn_all[i, : len(c)] = c
    w_all[i, : len(c)] = 1.0

f = jax.jit(jax.vmap(lambda p, c, w: fit_aniso(p, c, w, cfg, gcfg)))
est, th, se, ne = jax.device_get(
    f(jnp.array(pos_all), jnp.array(cn_all), jnp.array(w_all))
)
err = np.linalg.norm(est - src[:N], axis=-1)
nav = np.array(nav)
print(f"flights with >={gcfg.min_samples} samples: "
      f"{(nav >= gcfg.min_samples).mean():.2%}")
for gate in [2, 3, 4, 6, 10]:
    m = (nav >= gcfg.min_samples) & (se <= gate)
    if m.sum() == 0:
        print(f"se<={gate}: none")
        continue
    print(f"se<={gate:>3}: frac {m.mean():6.2%}  median {np.median(err[m]):6.1f}"
          f"  mean {err[m].mean():6.1f}  p90 {np.percentile(err[m], 90):6.1f}")
