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
_SALT_SRC = 3      # uses 3, 4, 5 (multi-source positions + strengths)


@struct.dataclass
class FieldState:
    """Per-episode plume field: a float source position, a turbulence seed,
    a per-episode wind vector (anisotropic model; zeros otherwise), and a
    bank row index (gridded model; 0 otherwise)."""

    source: jnp.ndarray      # f32[2]
    seed: jnp.ndarray        # uint32 scalar
    wind: jnp.ndarray        # f32[2] advection velocity (grid units / step)
    idx: jnp.ndarray         # i32 gridded-bank row


def new_field(key: jax.Array, cfg: EnvConfig, bank=None) -> FieldState:
    """Draw a fresh episode field (reference reset(): source ~
    U(padding, grid-padding)^2 + new random turbulence,
    PPOV1.1/environment.py:41-49).  With ``plume_model="gridded"`` the
    source comes from the sampled bank row instead."""
    k_src, k_seed, k_wind = jax.random.split(key, 3)
    lo = cfg.source_padding
    hi = cfg.grid_size - cfg.source_padding
    seed = jax.random.randint(k_seed, (), 0, jnp.iinfo(jnp.int32).max).astype(jnp.uint32)
    w_lo, w_hi = cfg.wind_speed_range
    if cfg.plume_model == "anisotropic" and w_hi > 0:
        k_speed, k_dir = jax.random.split(k_wind)
        speed = jax.random.uniform(k_speed, (), jnp.float32, w_lo, w_hi)
        theta = jax.random.uniform(k_dir, (), jnp.float32, 0.0, 2.0 * jnp.pi)
        wind = speed * jnp.stack([jnp.cos(theta), jnp.sin(theta)])
    else:
        wind = jnp.zeros(2, jnp.float32)
    if cfg.plume_model == "gridded":
        if bank is None:
            raise ValueError('plume_model="gridded" requires a FieldBank')
        idx = jax.random.randint(k_src, (), 0, bank.conc.shape[0])
        source = bank.source[idx]
    else:
        idx = jnp.zeros((), jnp.int32)
        source = jax.random.uniform(k_src, (2,), jnp.float32, lo, hi)
    return FieldState(source=source, seed=seed, wind=wind, idx=idx)


def new_field_from_draws(
    u_src: jnp.ndarray,    # f32[2] uniform [0,1) draws for the source
    u_wind: jnp.ndarray,   # f32[2] uniform [0,1) draws for (speed, direction)
    bits: jnp.ndarray,     # uint32 scalar turbulence seed
    cfg: EnvConfig,
    bank=None,
) -> FieldState:
    """``new_field`` from pregenerated uniform draws — the scan-friendly path
    used by rollouts so episode-boundary resets cost no in-scan threefry."""
    lo = cfg.source_padding
    hi = cfg.grid_size - cfg.source_padding
    w_lo, w_hi = cfg.wind_speed_range
    if cfg.plume_model == "anisotropic" and w_hi > 0:
        speed = w_lo + (w_hi - w_lo) * u_wind[0]
        theta = 2.0 * jnp.pi * u_wind[1]
        wind = speed * jnp.stack([jnp.cos(theta), jnp.sin(theta)])
    else:
        wind = jnp.zeros(2, jnp.float32)
    if cfg.plume_model == "gridded":
        if bank is None:
            raise ValueError('plume_model="gridded" requires a FieldBank')
        k = bank.conc.shape[0]
        idx = jnp.minimum((u_src[0] * k).astype(jnp.int32), k - 1)
        source = bank.source[idx]
    else:
        idx = jnp.zeros((), jnp.int32)
        source = lo + (hi - lo) * u_src
    return FieldState(source=source, seed=bits, wind=wind, idx=idx)


def extra_sources(field: FieldState, cfg: EnvConfig) -> jnp.ndarray:
    """Positions of sources 1..S-1 for multi-source fields, derived purely
    from the episode seed (no state-shape change; the primary source stays
    ``field.source``).  Returns f32[S-1, 2]; empty when num_sources == 1.

    Multi-source localization + flux inversion is the reference README's
    stated goal (<20% flux error, README.md:18) with no code anywhere in the
    reference — a new capability here (see evaluation/flux.py)."""
    s = cfg.num_sources - 1
    lo = cfg.source_padding
    hi = cfg.grid_size - cfg.source_padding
    ids = jnp.arange(1, s + 1, dtype=jnp.int32)
    ux = prng.bits_to_uniform(
        prng.hash_cell(field.seed, ids, jnp.zeros_like(ids), _SALT_SRC)
    )
    uy = prng.bits_to_uniform(
        prng.hash_cell(field.seed, jnp.zeros_like(ids), ids, _SALT_SRC + 1)
    )
    return lo + (hi - lo) * jnp.stack([ux, uy], axis=-1)


def all_sources(field: FieldState, cfg: EnvConfig) -> jnp.ndarray:
    """f32[S, 2]: the primary source plus the seed-derived extras."""
    if cfg.num_sources == 1:
        return field.source[None]
    return jnp.concatenate([field.source[None], extra_sources(field, cfg)])


def source_strengths(field: FieldState, cfg: EnvConfig) -> jnp.ndarray:
    """f32[S] per-source emission strengths (peak multipliers) in
    ``source_strength_range``, seed-derived; the primary source always emits
    at 1.0 so single-source semantics are unchanged."""
    s = cfg.num_sources
    if s == 1:
        return jnp.ones(1, jnp.float32)
    ids = jnp.arange(1, s, dtype=jnp.int32)
    u = prng.bits_to_uniform(
        prng.hash_cell(field.seed, ids, ids, _SALT_SRC + 2)
    )
    lo, hi = cfg.source_strength_range
    return jnp.concatenate([jnp.ones(1), lo + (hi - lo) * u])


def _turbulence(field: FieldState, ix: jnp.ndarray, iy: jnp.ndarray, cfg: EnvConfig) -> jnp.ndarray:
    n = prng.cell_normal(field.seed, ix, iy, _SALT_NORMAL)
    if not cfg.turbulence_signed_normal:
        n = jnp.abs(n)
    u = prng.cell_uniform(field.seed, ix, iy, _SALT_UNIFORM)
    fx = ix.astype(jnp.float32)
    fy = iy.astype(jnp.float32)
    wave = 0.3 * jnp.sin(0.05 * fx) * jnp.cos(0.07 * fy)
    return cfg.turbulence_intensity * (n + wave + 0.2 * u)


def _iso_kernel(source, fx, fy, cfg: EnvConfig, z=None):
    dx = fx - source[0]
    dy = fy - source[1]
    d2 = dx * dx + dy * dy
    if z is not None:
        dz = z - cfg.source_z
        d2 = d2 + dz * dz
    return cfg.conc_peak * jnp.exp(-d2 / (2.0 * cfg.plume_sigma**2))


def _isotropic_base(field: FieldState, fx, fy, cfg: EnvConfig, z=None):
    if cfg.num_sources == 1:
        return _iso_kernel(field.source, fx, fy, cfg, z)
    srcs = all_sources(field, cfg)
    qs = source_strengths(field, cfg)
    total = 0.0
    for s in range(cfg.num_sources):  # static, small S — fully fused
        total = total + qs[s] * _iso_kernel(srcs[s], fx, fy, cfg, z)
    return jnp.minimum(total, cfg.conc_peak)


def _anisotropic_base(field: FieldState, fx, fy, cfg: EnvConfig, z=None):
    """README-formula Gaussian dispersion: sigma_y = 0.3 d^0.71 crosswind
    spread growing downwind, centerline decaying by mass conservation, a
    sigma_y_min-sized kernel upwind of / around the source (README.md:97 of
    the reference; never implemented in its code — see SURVEY.md §2.2).

    With a ``z`` height the plume gains the standard Gaussian-dispersion
    vertical profile exp(-(z - source_z)^2 / (2 sigma_z^2)) with
    sigma_z = max(sigma_z_min, sigma_z_coef * downwind^sigma_z_exp) growing
    downwind like sigma_y, and the centerline decays by both spreads."""
    if cfg.num_sources > 1:
        srcs = all_sources(field, cfg)
        qs = source_strengths(field, cfg)
        total = 0.0
        for s in range(cfg.num_sources):
            total = total + qs[s] * _aniso_kernel(srcs[s], field.wind, fx, fy, cfg, z)
        return jnp.minimum(total, cfg.conc_peak)
    return _aniso_kernel(field.source, field.wind, fx, fy, cfg, z)


def _aniso_kernel(source, wind, fx, fy, cfg: EnvConfig, z=None):
    rel = jnp.stack([fx - source[0], fy - source[1]], axis=-1)
    speed = jnp.linalg.norm(wind) + 1e-8
    u = wind / speed
    downwind = rel[..., 0] * u[0] + rel[..., 1] * u[1]
    cross2 = jnp.maximum(
        rel[..., 0] ** 2 + rel[..., 1] ** 2 - downwind**2, 0.0
    )
    d = jnp.maximum(downwind, 0.0)
    sigma = jnp.maximum(cfg.sigma_y_min, cfg.sigma_y_coef * d**cfg.sigma_y_exp)
    centerline = cfg.conc_peak * (cfg.sigma_y_min / sigma)
    vert = 1.0
    blob_vert = 1.0
    if z is not None:
        dz = z - cfg.source_z
        sigma_z = jnp.maximum(cfg.sigma_z_min, cfg.sigma_z_coef * d**cfg.sigma_z_exp)
        centerline = centerline * (cfg.sigma_z_min / sigma_z)
        vert = jnp.exp(-(dz * dz) / (2.0 * sigma_z**2))
        blob_vert = jnp.exp(-(dz * dz) / (2.0 * cfg.sigma_z_min**2))
    plume = centerline * jnp.exp(-cross2 / (2.0 * sigma**2)) * vert
    # upwind: compact isotropic kernel so the source itself remains findable
    r2 = rel[..., 0] ** 2 + rel[..., 1] ** 2
    blob = cfg.conc_peak * jnp.exp(-r2 / (2.0 * cfg.sigma_y_min**2)) * blob_vert
    return jnp.where(downwind >= 0.0, jnp.maximum(plume, blob), blob)


def sample_conc_tke(
    field: FieldState, ix: jnp.ndarray, iy: jnp.ndarray, cfg: EnvConfig, bank=None,
    t: jnp.ndarray | None = None,
    z: jnp.ndarray | None = None,
    xy: jnp.ndarray | None = None,
):
    """Concentration and TKE at integer cell(s) (ix, iy). Broadcasts.

    Matches reading ``conc_field[ix, iy]`` / ``tke_field[ix, iy]`` of the
    reference's materialized arrays.  For ``plume_model="gridded"`` the base
    concentration is looked up from the HBM-resident bank row instead of
    evaluated analytically (turbulence stays procedural so gridded banks only
    need the mean field).

    ``z`` (agent height, grid units) engages the vertical plume profile /
    5-D bank level interpolation.  ``xy`` (float [..., 2] position) with
    ``cfg.subcell_sampling`` switches gridded reads to sub-cell multilinear
    interpolation — the north-star per-UAV (x, y, z, t) query; turbulence
    stays cell-hashed either way (it models sub-grid variance)."""
    fx = ix.astype(jnp.float32)
    fy = iy.astype(jnp.float32)
    if cfg.plume_model == "gridded":
        if bank is None:
            raise ValueError('plume_model="gridded" requires a FieldBank')
        from tpu_plume.fields.gridded import sample_bank, sample_bank_points

        if cfg.subcell_sampling and xy is not None:
            base = sample_bank_points(
                bank, field.idx, xy[..., 0], xy[..., 1], t, z,
                gather_mode=cfg.bank_gather_mode,
            )
        else:
            base = sample_bank(bank, field.idx, ix, iy, t, z)
    elif cfg.plume_model == "anisotropic":
        base = _anisotropic_base(field, fx, fy, cfg, z)
    else:
        base = _isotropic_base(field, fx, fy, cfg, z)
    turb = _turbulence(field, ix, iy, cfg)
    conc = jnp.clip(base + turb, 0.0, cfg.conc_peak)
    tke = jnp.abs(turb) * 2.0 if cfg.tke_abs_times_two else turb
    return conc, tke


def materialize_fields(field: FieldState, cfg: EnvConfig, bank=None, t=None):
    """Materialize full (grid, grid) conc/tke arrays — for tests, plotting,
    and parity checks against the reference's per-reset arrays.  Not used in
    the training hot path."""
    g = cfg.grid_size
    ix = jax.lax.broadcasted_iota(jnp.int32, (g, g), 0)
    iy = jax.lax.broadcasted_iota(jnp.int32, (g, g), 1)
    return sample_conc_tke(field, ix, iy, cfg, bank, t)
