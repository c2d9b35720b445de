"""Post-hoc source localization from evaluation flights.

Under the reference protocol the reported deviation is the flight's FINAL
distance to the source — bounded below by crossing-chord geometry (~34 px
success-case mean in every committed run).  But the flight's own (x, y,
conc) history contains far more information than its endpoint: the
trained ``GaussianParamPredictor`` (the reference's zoo head,
PPOV2.1/model.py:308-322, dead code there) recovers the source position
from the tail window of each trajectory — the same data, a far tighter
localization.  Cite: the reference project's stated goal is <5 m source
localization error (README.md:17), which its endpoint metric cannot
reach; this is the component that can.
"""

from __future__ import annotations

import numpy as np


def localize_from_trajectories(
    trajectories: np.ndarray,
    params,
    window: int = 64,
    grid_size: float = 500.0,
    conc_peak: float = 100.0,
) -> np.ndarray:
    """Predict source positions [K, 2] (grid units) from NaN-padded
    evaluation trajectories [K, T, 3] of (x, y, conc) per step."""
    import jax.numpy as jnp

    from tpu_plume.models import GaussianParamPredictor

    k = trajectories.shape[0]
    feats = np.zeros((k, window, 3), np.float32)
    lens = np.zeros((k,), np.int32)
    for i in range(k):
        valid = np.isfinite(trajectories[i, :, 0])
        rows = trajectories[i, valid]
        length = min(len(rows), window)
        if length == 0:
            lens[i] = 1  # degenerate: all-NaN episode; predict from zeros
            continue
        tail = rows[len(rows) - length:]
        feats[i, :length, 0] = tail[:, 0] / grid_size
        feats[i, :length, 1] = tail[:, 1] / grid_size
        feats[i, :length, 2] = tail[:, 2] / conc_peak
        lens[i] = length
    model = GaussianParamPredictor()
    pred = np.asarray(
        model.apply(params, jnp.asarray(feats), jnp.asarray(lens))
    )[:, :2]
    return pred * grid_size
