"""Gridded plume fields: an HBM-resident bank of mean-concentration grids.

The WRF-LES-flavored path (BASELINE.json north star): instead of evaluating
the plume analytically, each episode samples a row of a ``FieldBank`` —
``conc: f32[K, H, W]`` grids living in HBM — and the env reads the grid at
the agent's cell.  Banks come from

  - ``ingest_netcdf``: real WRF-LES / CFD output (any NetCDF/HDF5 file with a
    [K, H, W] or [H, W] concentration variable + source coordinates), loaded
    once to device memory;
  - ``synthesize_bank``: procedurally generated anisotropic-dispersion grids
    (for experimentation without data, and for tests).

Procedural turbulence stays analytic (tpu_plume.core.prng), so banks only
need the mean field — K=1024 grids of 500x500 f32 are 1 GB of HBM, and cell
lookups are one XLA gather per step across all envs.  For sub-cell accuracy
(float positions, big grids) see tpu_plume.ops.gather for the bilinear
samplers (XLA gather and MXU one-hot-matmul variants).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from tpu_plume.core.config import EnvConfig


@struct.dataclass
class FieldBank:
    """conc is f32[K, H, W] (static fields) or f32[K, T, H, W] (time-varying
    WRF-LES-style volumes, linearly interpolated over the frame axis at
    ``steps_per_frame`` env steps per frame)."""

    conc: jnp.ndarray     # f32[K, H, W] or f32[K, T, H, W]
    source: jnp.ndarray   # f32[K, 2] source position per grid
    steps_per_frame: float = struct.field(pytree_node=False, default=1.0)


def sample_bank(bank: FieldBank, idx, ix, iy, t=None) -> jnp.ndarray:
    """Cell lookup with optional linear time interpolation (broadcasts)."""
    if bank.conc.ndim == 3:
        return bank.conc[idx, ix, iy]
    num_frames = bank.conc.shape[1]
    tf = (jnp.zeros_like(ix, jnp.float32) if t is None
          else t.astype(jnp.float32)) / bank.steps_per_frame
    t0 = jnp.clip(jnp.floor(tf).astype(jnp.int32), 0, num_frames - 2)
    ft = jnp.clip(tf - t0.astype(jnp.float32), 0.0, 1.0)
    a = bank.conc[idx, t0, ix, iy]
    b = bank.conc[idx, t0 + 1, ix, iy]
    return (1.0 - ft) * a + ft * b


def synthesize_bank(
    key: jax.Array, cfg: EnvConfig, num_fields: int = 64
) -> FieldBank:
    """Generate an anisotropic-dispersion bank (sigma_y = 0.3 x^0.71 plumes
    with random winds) on device."""
    from tpu_plume.fields.analytic import FieldState, _anisotropic_base

    g = cfg.grid_size
    k_src, k_wind = jax.random.split(key)
    lo, hi = cfg.source_padding, g - cfg.source_padding
    sources = jax.random.uniform(k_src, (num_fields, 2), jnp.float32, lo, hi)
    theta = jax.random.uniform(k_wind, (num_fields,), jnp.float32, 0, 2 * jnp.pi)
    winds = jnp.stack([jnp.cos(theta), jnp.sin(theta)], axis=-1)

    ix = jax.lax.broadcasted_iota(jnp.int32, (g, g), 0).astype(jnp.float32)
    iy = jax.lax.broadcasted_iota(jnp.int32, (g, g), 1).astype(jnp.float32)

    def one(source, wind):
        fs = FieldState(
            source=source,
            seed=jnp.uint32(0),
            wind=wind,
            idx=jnp.int32(0),
        )
        return _anisotropic_base(fs, ix, iy, cfg)

    conc = jax.vmap(one)(sources, winds)
    return FieldBank(conc=conc, source=sources)


def synthesize_time_varying_bank(
    key: jax.Array,
    cfg: EnvConfig,
    num_fields: int = 8,
    num_frames: int = 16,
    steps_per_frame: float = 64.0,
    grid: int | None = None,
) -> FieldBank:
    """Time-varying anisotropic plumes: the wind direction veers across
    frames, sweeping the downwind ribbon — a synthetic stand-in for a
    time-resolved WRF-LES volume."""
    from tpu_plume.fields.analytic import FieldState, _anisotropic_base

    g = grid or cfg.grid_size
    k_src, k_wind, k_veer = jax.random.split(key, 3)
    lo, hi = cfg.source_padding, g - cfg.source_padding
    sources = jax.random.uniform(k_src, (num_fields, 2), jnp.float32, lo, hi)
    theta0 = jax.random.uniform(k_wind, (num_fields,), jnp.float32, 0, 2 * jnp.pi)
    veer = jax.random.uniform(k_veer, (num_fields,), jnp.float32, -1.0, 1.0)

    ix = jax.lax.broadcasted_iota(jnp.int32, (g, g), 0).astype(jnp.float32)
    iy = jax.lax.broadcasted_iota(jnp.int32, (g, g), 1).astype(jnp.float32)

    def one_frame(source, theta):
        wind = jnp.stack([jnp.cos(theta), jnp.sin(theta)])
        fs = FieldState(source=source, seed=jnp.uint32(0), wind=wind, idx=jnp.int32(0))
        return _anisotropic_base(fs, ix, iy, cfg)

    def one_field(source, th0, v):
        thetas = th0 + v * jnp.linspace(0.0, 1.0, num_frames)
        return jax.vmap(lambda th: one_frame(source, th))(thetas)

    conc = jax.vmap(one_field)(sources, theta0, veer)
    return FieldBank(conc=conc, source=sources, steps_per_frame=steps_per_frame)


def ingest_netcdf(
    path: str,
    conc_var: str = "concentration",
    source_x_var: str = "source_x",
    source_y_var: str = "source_y",
    scale_to_peak: float | None = None,
) -> FieldBank:
    """Load a bank from a NetCDF/HDF5 file: ``conc_var`` of shape [K, H, W]
    (or [H, W], promoted to K=1) plus per-field source coordinates.  The data
    loads once to HBM; optionally rescaled so max == ``scale_to_peak``."""
    import h5py

    with h5py.File(path, "r") as f:
        conc = np.asarray(f[conc_var], np.float32)
        if conc.ndim == 2:
            conc = conc[None]
        sx = np.atleast_1d(np.asarray(f[source_x_var], np.float32))
        sy = np.atleast_1d(np.asarray(f[source_y_var], np.float32))
    if scale_to_peak is not None and conc.max() > 0:
        conc = conc * (scale_to_peak / conc.max())
    source = np.stack([sx, sy], axis=-1)
    if conc.ndim == 4 and source.shape[0] != conc.shape[0]:
        raise ValueError("time-varying ingest needs one source per field")
    if source.shape[0] != conc.shape[0]:
        raise ValueError(
            f"{source.shape[0]} sources for {conc.shape[0]} fields in {path}"
        )
    return FieldBank(conc=jnp.asarray(conc), source=jnp.asarray(source))


def export_bank_netcdf(bank: FieldBank, path: str) -> None:
    """Persist a bank in the ingest format (round-trips with ingest_netcdf)."""
    import h5py

    conc = np.asarray(bank.conc)
    src = np.asarray(bank.source)
    with h5py.File(path, "w") as f:
        f.create_dataset("concentration", data=conc, compression="gzip")
        f.create_dataset("source_x", data=src[:, 0])
        f.create_dataset("source_y", data=src[:, 1])
