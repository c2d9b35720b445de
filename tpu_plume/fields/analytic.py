"""Analytic methane-plume field: isotropic Gaussian + procedural turbulence.

Reference semantics (PPOV1.1/environment.py:51-62, PPOV2.1/environment.py:52-69,
PPOV1.0/ppo0.0.py:102-114):

    base(ix, iy)  = peak * exp(-((ix-sx)^2 + (iy-sy)^2) / (2 sigma^2))
    turb(ix, iy)  = TI * (|N(0,1)| + 0.3 sin(0.05 ix) cos(0.07 iy) + 0.2 U(0,1))
    conc          = clip(base + turb, 0, peak)
    tke           = turb                      (V1.1+)
    turb normal is signed and tke = |turb|*2  (V1.0)

where (ix, iy) are integer grid cells and (sx, sy) is the float source
position.  The reference materializes these as 500x500 arrays per reset; here
they are pure functions of ``(field_seed, ix, iy)`` evaluated only at the
agent's cell (see tpu_plume.core.prng), which removes the O(grid^2) reset cost
and lets thousands of vmapped envs each carry an independent field for the
price of one uint32 seed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from tpu_plume.core import prng
from tpu_plume.core.config import EnvConfig

# Salt namespaces for the per-cell hash draws.
_SALT_NORMAL = 0   # uses 0 and 1 (Box-Muller needs two uniforms)
_SALT_UNIFORM = 2


@struct.dataclass
class FieldState:
    """Per-episode plume field: a float source position + a turbulence seed."""

    source: jnp.ndarray      # f32[2]
    seed: jnp.ndarray        # uint32 scalar


def new_field(key: jax.Array, cfg: EnvConfig) -> FieldState:
    """Draw a fresh episode field (reference reset(): source ~
    U(padding, grid-padding)^2 + new random turbulence,
    PPOV1.1/environment.py:41-49)."""
    k_src, k_seed = jax.random.split(key)
    lo = cfg.source_padding
    hi = cfg.grid_size - cfg.source_padding
    source = jax.random.uniform(k_src, (2,), jnp.float32, lo, hi)
    seed = jax.random.randint(k_seed, (), 0, jnp.iinfo(jnp.int32).max).astype(jnp.uint32)
    return FieldState(source=source, seed=seed)


def _turbulence(field: FieldState, ix: jnp.ndarray, iy: jnp.ndarray, cfg: EnvConfig) -> jnp.ndarray:
    n = prng.cell_normal(field.seed, ix, iy, _SALT_NORMAL)
    if not cfg.turbulence_signed_normal:
        n = jnp.abs(n)
    u = prng.cell_uniform(field.seed, ix, iy, _SALT_UNIFORM)
    fx = ix.astype(jnp.float32)
    fy = iy.astype(jnp.float32)
    wave = 0.3 * jnp.sin(0.05 * fx) * jnp.cos(0.07 * fy)
    return cfg.turbulence_intensity * (n + wave + 0.2 * u)


def sample_conc_tke(field: FieldState, ix: jnp.ndarray, iy: jnp.ndarray, cfg: EnvConfig):
    """Concentration and TKE at integer cell(s) (ix, iy). Broadcasts.

    Matches reading ``conc_field[ix, iy]`` / ``tke_field[ix, iy]`` of the
    reference's materialized arrays.
    """
    dx = ix.astype(jnp.float32) - field.source[0]
    dy = iy.astype(jnp.float32) - field.source[1]
    d2 = dx * dx + dy * dy
    base = cfg.conc_peak * jnp.exp(-d2 / (2.0 * cfg.plume_sigma**2))
    turb = _turbulence(field, ix, iy, cfg)
    conc = jnp.clip(base + turb, 0.0, cfg.conc_peak)
    tke = jnp.abs(turb) * 2.0 if cfg.tke_abs_times_two else turb
    return conc, tke


def materialize_fields(field: FieldState, cfg: EnvConfig):
    """Materialize full (grid, grid) conc/tke arrays — for tests, plotting,
    and parity checks against the reference's per-reset arrays.  Not used in
    the training hot path."""
    g = cfg.grid_size
    ix = jax.lax.broadcasted_iota(jnp.int32, (g, g), 0)
    iy = jax.lax.broadcasted_iota(jnp.int32, (g, g), 1)
    return sample_conc_tke(field, ix, iy, cfg)
