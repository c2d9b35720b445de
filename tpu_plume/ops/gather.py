"""Field-query primitives for gridded plume banks.

The reference reads its materialized fields at integer cells with NumPy fancy
indexing (PPOV1.1/environment.py:76-77).  On TPU, scattered gathers are the
wrong primitive — the MXU wants dense contractions — so two strategies are
provided and benchmarked:

  - ``*_xla``: XLA's native gather.  Fine for a few thousand point queries.
  - ``bilinear_onehot``: the MXU-native formulation — the interpolation
    weights are embedded in two "one-hot-ish" matrices and the gather becomes
    two dense matmuls:  out = rowsum( (Wx @ F) * Wy ),  Wx: [N, H] with the
    x-weights at (ix, ix+1), Wy: [N, W] with the y-weights.  O(N*H*W) FLOPs
    traded for zero irregular memory traffic; wins when N is large and the
    grid is modest.  A Pallas-tiled version lives in
    tpu_plume.ops.pallas_gather.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bank_cell_lookup(
    bank_conc: jnp.ndarray,  # f32[K, H, W]
    idx: jnp.ndarray,        # i32[N] bank row per query
    ix: jnp.ndarray,         # i32[N]
    iy: jnp.ndarray,         # i32[N]
) -> jnp.ndarray:
    """Integer-cell lookup across a bank (the env hot-path read)."""
    return bank_conc[idx, ix, iy]


def bilinear_xla(field: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample of ``field`` [H, W] at float points ``pts`` [N, 2]
    (clamped to the valid domain), via 4 XLA gathers."""
    h, w = field.shape
    x = jnp.clip(pts[:, 0], 0.0, h - 1.0)
    y = jnp.clip(pts[:, 1], 0.0, w - 1.0)
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, h - 2)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, w - 2)
    fx = x - x0
    fy = y - y0
    v00 = field[x0, y0]
    v01 = field[x0, y0 + 1]
    v10 = field[x0 + 1, y0]
    v11 = field[x0 + 1, y0 + 1]
    return (
        v00 * (1 - fx) * (1 - fy)
        + v01 * (1 - fx) * fy
        + v10 * fx * (1 - fy)
        + v11 * fx * fy
    )


def _axis_weights(coord: jnp.ndarray, size: int) -> jnp.ndarray:
    """[N, size] matrix with (1-f) at floor(coord) and f at floor(coord)+1."""
    c = jnp.clip(coord, 0.0, size - 1.0)
    c0 = jnp.clip(jnp.floor(c).astype(jnp.int32), 0, size - 2)
    f = c - c0
    cols = jax.lax.broadcasted_iota(jnp.int32, (coord.shape[0], size), 1)
    return jnp.where(
        cols == c0[:, None], (1.0 - f)[:, None],
        jnp.where(cols == c0[:, None] + 1, f[:, None], 0.0),
    )


def bilinear_onehot(field: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """MXU formulation: two dense matmuls instead of gathers."""
    h, w = field.shape
    wx = _axis_weights(pts[:, 0], h)              # [N, H]
    wy = _axis_weights(pts[:, 1], w)              # [N, W]
    rows = jnp.dot(wx, field, preferred_element_type=jnp.float32)  # [N, W]
    return jnp.sum(rows * wy, axis=-1)


def trilinear_zyx_xla(volume: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Trilinear sample of ``volume`` [Z, H, W] at float points ``pts``
    [N, 3] = (z, x, y) in index units, clamped — the spatial 3-D field query
    (z is interpolated like x/y; for the time axis see ``trilinear_xla``)."""
    zd, h, w = volume.shape
    z = jnp.clip(pts[:, 0], 0.0, zd - 1.0)
    x = jnp.clip(pts[:, 1], 0.0, h - 1.0)
    y = jnp.clip(pts[:, 2], 0.0, w - 1.0)
    z0 = (jnp.clip(jnp.floor(z).astype(jnp.int32), 0, zd - 2)
          if zd > 1 else jnp.zeros_like(z, jnp.int32))
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, h - 2)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, w - 2)
    fz = z - z0 if zd > 1 else jnp.zeros_like(z)
    fx = x - x0
    fy = y - y0
    z1 = jnp.minimum(z0 + 1, zd - 1)

    def plane(zi):
        v00 = volume[zi, x0, y0]
        v01 = volume[zi, x0, y0 + 1]
        v10 = volume[zi, x0 + 1, y0]
        v11 = volume[zi, x0 + 1, y0 + 1]
        return (v00 * (1 - fx) * (1 - fy) + v01 * (1 - fx) * fy
                + v10 * fx * (1 - fy) + v11 * fx * fy)

    return plane(z0) * (1 - fz) + plane(z1) * fz


def trilinear_xla(volume: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Trilinear sample of ``volume`` [T, H, W] at float points ``pts``
    [N, 3] = (t, x, y), clamped — the time-varying WRF-LES field query."""
    td, h, w = volume.shape
    t = jnp.clip(pts[:, 0], 0.0, td - 1.0)
    x = jnp.clip(pts[:, 1], 0.0, h - 1.0)
    y = jnp.clip(pts[:, 2], 0.0, w - 1.0)
    t0 = jnp.clip(jnp.floor(t).astype(jnp.int32), 0, td - 2) if td > 1 else jnp.zeros_like(t, jnp.int32)
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, h - 2)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, w - 2)
    ft = t - t0 if td > 1 else jnp.zeros_like(t)
    fx = x - x0
    fy = y - y0
    t1 = jnp.minimum(t0 + 1, td - 1)

    def plane(ti):
        v00 = volume[ti, x0, y0]
        v01 = volume[ti, x0, y0 + 1]
        v10 = volume[ti, x0 + 1, y0]
        v11 = volume[ti, x0 + 1, y0 + 1]
        return (v00 * (1 - fx) * (1 - fy) + v01 * (1 - fx) * fy
                + v10 * fx * (1 - fy) + v11 * fx * fy)

    return plane(t0) * (1 - ft) + plane(t1) * ft
