"""Pallas fused analytic-plume sampler.

The env hot path evaluates, per query cell: the Gaussian base, the
procedural-hash turbulence (integer avalanche + Box-Muller), and the clip —
all elementwise VPU work (tpu_plume.fields.analytic).  XLA already fuses this
well inside the rollout scan; this kernel is the standalone speed-of-light
version (and the building block for future in-kernel rollout fusion): one
pass, no intermediate HBM traffic, queries tiled (8, 128) in VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_plume.core import prng
from tpu_plume.core.config import EnvConfig
from tpu_plume.fields.analytic import _SALT_NORMAL, _SALT_UNIFORM

LANES = 128
SUBLANES = 8
BLOCK = SUBLANES * LANES


def _kernel(x_ref, y_ref, sx_ref, sy_ref, seed_ref, conc_ref, tke_ref, *, cfg: EnvConfig):
    g = cfg.grid_size
    ix = jnp.clip(jnp.floor(x_ref[:]).astype(jnp.int32), 0, g - 1)
    iy = jnp.clip(jnp.floor(y_ref[:]).astype(jnp.int32), 0, g - 1)
    fx = ix.astype(jnp.float32)
    fy = iy.astype(jnp.float32)

    dx = fx - sx_ref[:]
    dy = fy - sy_ref[:]
    base = cfg.conc_peak * jnp.exp(
        -(dx * dx + dy * dy) / (2.0 * cfg.plume_sigma**2)
    )

    seed = seed_ref[:].astype(jnp.uint32)
    n = prng.cell_normal(seed, ix, iy, _SALT_NORMAL)
    if not cfg.turbulence_signed_normal:
        n = jnp.abs(n)
    u = prng.cell_uniform(seed, ix, iy, _SALT_UNIFORM)
    wave = 0.3 * jnp.sin(0.05 * fx) * jnp.cos(0.07 * fy)
    turb = cfg.turbulence_intensity * (n + wave + 0.2 * u)

    conc_ref[:] = jnp.clip(base + turb, 0.0, cfg.conc_peak)
    tke_ref[:] = jnp.abs(turb) * 2.0 if cfg.tke_abs_times_two else turb


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def sample_plume_pallas(
    pos: jnp.ndarray,     # f32[N, 2] query positions
    source: jnp.ndarray,  # f32[N, 2] per-query source
    seed: jnp.ndarray,    # uint32[N] per-query field seed
    cfg: EnvConfig,
    interpret: bool = False,
):
    """Fused (conc, tke) evaluation; matches
    fields.analytic.sample_conc_tke on the isotropic model."""
    n = pos.shape[0]
    n_pad = _round_up(max(n, BLOCK), BLOCK)
    rows = n_pad // LANES

    def shape(v):
        out = jnp.zeros(n_pad, v.dtype).at[:n].set(v)
        return out.reshape(rows, LANES)

    xs, ys = shape(pos[:, 0]), shape(pos[:, 1])
    sxs, sys_ = shape(source[:, 0]), shape(source[:, 1])
    seeds = shape(seed.astype(jnp.uint32))

    spec = pl.BlockSpec((SUBLANES, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    conc, tke = pl.pallas_call(
        functools.partial(_kernel, cfg=cfg),
        out_shape=(
            jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
        ),
        grid=(rows // SUBLANES,),
        in_specs=[spec] * 5,
        out_specs=(spec, spec),
        interpret=interpret,
    )(xs, ys, sxs, sys_, seeds)
    return conc.reshape(-1)[:n], tke.reshape(-1)[:n]
