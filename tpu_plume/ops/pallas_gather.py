"""Pallas bilinear field-gather kernel (MXU one-hot-matmul formulation).

The TPU-native replacement for the reference's NumPy fancy-indexed field
reads (PPOV1.1/environment.py:76-77) at scale: the field grid stays resident
in VMEM across the whole query batch, each 128-point block builds its
interpolation-weight matrices in-register and contracts them against the
grid on the MXU — no scattered HBM gathers at all.

    out = rowsum( (Wx @ F) * Wy )

Kernel layout per grid step i:
    pts block  [128, 2]   VMEM   (query positions)
    field      [H, Wp]    VMEM   (whole grid, W padded to lane multiple)
    out block  [128, 1]   VMEM

See /opt/skills/guides/pallas_guide.md for the API conventions used here.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_N = 128


def _kernel(pts_ref, field_ref, out_ref, *, h: int, w: int):
    pts = pts_ref[:]                       # [BLOCK_N, 2]
    x = jnp.clip(pts[:, 0], 0.0, h - 1.0)
    y = jnp.clip(pts[:, 1], 0.0, w - 1.0)
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, h - 2)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, w - 2)
    fx = x - x0.astype(jnp.float32)
    fy = y - y0.astype(jnp.float32)

    hp = field_ref.shape[0]
    wp = field_ref.shape[1]
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

    rows = jnp.dot(wx, field_ref[:], preferred_element_type=jnp.float32)
    out_ref[:] = jnp.sum(rows * wy, axis=-1, keepdims=True)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames="interpret")
def bilinear_pallas(field: jnp.ndarray, pts: jnp.ndarray, interpret: bool = False):
    """Bilinear sample of ``field`` [H, W] at ``pts`` [N, 2]; N padded
    internally to a BLOCK_N multiple."""
    h, w = field.shape
    n = pts.shape[0]
    n_pad = _round_up(max(n, BLOCK_N), BLOCK_N)
    hp = _round_up(h, 8)
    wp = _round_up(w, 128)
    field_p = jnp.zeros((hp, wp), field.dtype).at[:h, :w].set(field)
    pts_p = jnp.zeros((n_pad, 2), pts.dtype).at[:n].set(pts)

    out = pl.pallas_call(
        functools.partial(_kernel, h=h, w=w),
        out_shape=jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
        grid=(n_pad // BLOCK_N,),
        in_specs=[
            pl.BlockSpec((BLOCK_N, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hp, wp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLOCK_N, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(pts_p, field_p)
    return out[:n, 0]
