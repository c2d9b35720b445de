"""Pallas trilinear field-gather kernel for 3-D (WRF-LES-style) volumes.

The north-star field query (BASELINE.json: "Pallas trilinear-gather kernel
for per-UAV (x, y, z, t) field queries"): sample a [Z, H, W] volume at N
float points.  The volume is far too large for VMEM (a 500x500x16 f32 volume
is 16 MB), so the kernel streams one z-slab [H, W] per grid step through the
Pallas pipeline (which double-buffers the HBM->VMEM DMA automatically across
grid iterations) while a 128-query block stays resident.  Per slab, the
in-plane bilinear sample is the MXU one-hot-matmul formulation (see
tpu_plume.ops.pallas_gather):

    bil_k = rowsum( (Wx @ slab_k) * Wy )        # [BLOCK_N]
    out  += wz_k * bil_k                        # wz_k: per-query z weight,
                                                # nonzero for <=2 slabs

Grid layout: (num_blocks, Z) with z innermost, so each query block's output
tile is revisited across the z sweep (accumulated in place) and the slab DMA
of iteration k+1 overlaps the matmuls of iteration k.

The time axis is handled by the caller as two slab-sampled volumes (frame t0
and t0+1) — see ``tpu_plume.fields.gridded.sample_bank`` — because frame
interpolation weights are per-query scalars, the same trick as wz.

Reference counterpart: none (the reference reads integer cells of a 2-D
NumPy array, PPOV1.1/environment.py:76-77; its WRF-LES coupling was
aspirational — SURVEY.md §0).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_N = 128


def _kernel(pts_ref, slab_ref, out_ref, *, zd: int, h: int, w: int):
    k = pl.program_id(1)  # z-slab index (innermost grid dim)

    @pl.when(k == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    pts = pts_ref[:]                       # [BLOCK_N, 3] = (z, x, y)
    z = jnp.clip(pts[:, 0], 0.0, zd - 1.0)
    x = jnp.clip(pts[:, 1], 0.0, h - 1.0)
    y = jnp.clip(pts[:, 2], 0.0, w - 1.0)
    z0 = jnp.clip(jnp.floor(z).astype(jnp.int32), 0, max(zd - 2, 0))
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, h - 2)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, w - 2)
    fz = z - z0.astype(jnp.float32)
    fx = x - x0.astype(jnp.float32)
    fy = y - y0.astype(jnp.float32)

    # Per-query weight of THIS slab in the z interpolation.
    if zd == 1:
        wz = jnp.ones_like(fz)
    else:
        wz = jnp.where(
            z0 == k, 1.0 - fz, jnp.where(z0 + 1 == k, fz, 0.0)
        )

    hp = slab_ref.shape[1]
    wp = slab_ref.shape[2]
    rows_h = jax.lax.broadcasted_iota(jnp.int32, (BLOCK_N, hp), 1)
    wx = jnp.where(
        rows_h == x0[:, None], (1.0 - fx)[:, None],
        jnp.where(rows_h == x0[:, None] + 1, fx[:, None], 0.0),
    )
    rows_w = jax.lax.broadcasted_iota(jnp.int32, (BLOCK_N, wp), 1)
    wy = jnp.where(
        rows_w == y0[:, None], (1.0 - fy)[:, None],
        jnp.where(rows_w == y0[:, None] + 1, fy[:, None], 0.0),
    )

    rows = jnp.dot(wx, slab_ref[0], preferred_element_type=jnp.float32)
    bil = jnp.sum(rows * wy, axis=-1, keepdims=True)   # [BLOCK_N, 1]
    out_ref[:] += wz[:, None] * bil


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames="interpret")
def trilinear_pallas(
    volume: jnp.ndarray, pts: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """Trilinear sample of ``volume`` [Z, H, W] at ``pts`` [N, 3] = (z, x, y)
    float index coordinates (clamped).  Parity partner:
    ``tpu_plume.ops.gather.trilinear_zyx_xla``."""
    zd, h, w = volume.shape
    n = pts.shape[0]
    n_pad = _round_up(max(n, BLOCK_N), BLOCK_N)
    hp = _round_up(h, 8)
    wp = _round_up(w, 128)
    vol_p = jnp.zeros((zd, hp, wp), volume.dtype).at[:, :h, :w].set(volume)
    pts_p = jnp.zeros((n_pad, 3), pts.dtype).at[:n].set(pts)

    out = pl.pallas_call(
        functools.partial(_kernel, zd=zd, h=h, w=w),
        out_shape=jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
        grid=(n_pad // BLOCK_N, zd),
        in_specs=[
            pl.BlockSpec(
                (BLOCK_N, 3), lambda i, k: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, hp, wp), lambda i, k: (k, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (BLOCK_N, 1), lambda i, k: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(pts_p, vol_p)
    return out[:n, 0]
