"""Flux inversion: estimate per-source emission strengths from flight data.

The reference README's stated quantitative goal — "flux-inversion error
< 20%" (reference README.md:18, 65) — has NO code anywhere in the reference
(SURVEY.md §6); this module implements it.  Given concentration samples
collected along UAV trajectories and the dispersion kernel model, the
per-source strengths are the least-squares solution of the linear system

    c_i  ≈  Σ_s  q_s · K_s(p_i)          (turbulence is zero-mean-ish noise)

where K_s is the unit-strength kernel of source s (isotropic Gaussian or the
anisotropic σ_y=0.3·d^0.71 dispersion with the episode wind).  Saturated
samples (clipped at conc_peak) are excluded — the clip breaks linearity.

Everything is jit-able jnp; the study harness batches episodes with vmap.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tpu_plume.core.config import EnvConfig
from tpu_plume.fields.analytic import (
    _aniso_kernel,
    _iso_kernel,
    all_sources,
    source_strengths,
)


def design_matrix(
    points: jnp.ndarray,      # f32[N, 2] sample positions
    sources: jnp.ndarray,     # f32[S, 2]
    wind: jnp.ndarray,        # f32[2] episode wind (anisotropic model)
    cfg: EnvConfig,
    z: jnp.ndarray | None = None,   # f32[N] heights (3-D flight)
) -> jnp.ndarray:
    """A[i, s] = unit-strength kernel of source s at sample i."""
    fx, fy = points[:, 0], points[:, 1]

    def col(src):
        if cfg.plume_model == "anisotropic":
            return _aniso_kernel(src, wind, fx, fy, cfg, z)
        return _iso_kernel(src, fx, fy, cfg, z)

    return jax.vmap(col)(sources).T        # [N, S]


def invert_fluxes(
    points: jnp.ndarray,
    concs: jnp.ndarray,       # f32[N] measured concentrations
    sources: jnp.ndarray,
    wind: jnp.ndarray,
    cfg: EnvConfig,
    z: jnp.ndarray | None = None,
    valid: jnp.ndarray | None = None,   # bool[N] sample mask
    saturation_frac: float = 0.95,
    ridge: float = 1e-6,
) -> jnp.ndarray:
    """Least-squares per-source strengths q [S] (ridge-regularized normal
    equations — fixed shapes, jit/vmap-safe).  Invalid and saturated samples
    are masked out by zero row weights."""
    a = design_matrix(points, sources, wind, cfg, z)
    w = (concs < saturation_frac * cfg.conc_peak).astype(jnp.float32)
    if valid is not None:
        w = w * valid.astype(jnp.float32)
    aw = a * w[:, None]
    ata = aw.T @ a
    # Ridge scaled to the design: unobserved sources (near-zero columns)
    # resolve to q ~= 0 instead of exploding the solve.
    lam = ridge * (jnp.trace(ata) / a.shape[1] + 1e-9)
    return jnp.linalg.solve(ata + lam * jnp.eye(a.shape[1]), aw.T @ concs)


def source_observability(
    points: jnp.ndarray,
    sources: jnp.ndarray,
    wind: jnp.ndarray,
    cfg: EnvConfig,
    z: jnp.ndarray | None = None,
    frac: float = 0.05,
) -> jnp.ndarray:
    """bool[S]: source s counts as *observed* if some sample saw at least
    ``frac`` of its unit-strength peak signal — a flux is only invertible
    for sources the flight actually sampled."""
    a = design_matrix(points, sources, wind, cfg, z)
    return jnp.max(a, axis=0) >= frac * cfg.conc_peak


def flux_inversion_study(
    cfg: EnvConfig,
    key: jax.Array,
    num_episodes: int = 64,
    num_steps: int = 400,
    policy: Optional[Callable] = None,   # (obs[N,D]) -> logits; None = random
    params=None,
) -> dict:
    """Fly ``num_episodes`` surveys, collect (position, conc) samples, invert
    fluxes per episode, and report relative-error statistics against the
    seed-derived true strengths — the README <20% goal as a measured number.
    """
    from tpu_plume.env.methane import reset, step_noise

    n = num_episodes
    k_reset, k_act, k_noise = jax.random.split(key, 3)
    reset_keys = jax.random.split(k_reset, n)

    def run(reset_keys, k_act, k_noise):
        env_state, obs = jax.vmap(lambda k: reset(k, cfg))(reset_keys)
        noises = jax.random.normal(
            k_noise, (num_steps, n, cfg.pos_dim), jnp.float32
        )
        gumbels = jax.random.gumbel(
            k_act, (num_steps, n, cfg.num_actions), jnp.float32
        )

        def body(carry, xs):
            env_state, obs = carry
            noise_t, gumbel_t = xs
            if policy is not None:
                logits, _ = policy(params, obs)
                action = jnp.argmax(logits + gumbel_t, axis=-1)
            else:
                action = jnp.argmax(gumbel_t, axis=-1)   # uniform random
            env_state, trans = jax.vmap(
                lambda s, a, nz: step_noise(s, a, nz, cfg)
            )(env_state, action, noise_t)
            zs = env_state.pos[:, 2] if cfg.env_3d else jnp.zeros(n)
            return (env_state, trans.obs), (
                env_state.pos[:, :2], zs, trans.info.conc_raw
            )

        (env_state, _), (pts, zs, concs) = jax.lax.scan(
            body, (env_state, obs), (noises, gumbels)
        )
        # [T, N, ...] -> per-episode [N, T, ...]
        pts = jnp.swapaxes(pts, 0, 1)
        zs = jnp.swapaxes(zs, 0, 1)
        concs = jnp.swapaxes(concs, 0, 1)

        def one(field, p, zz, c):
            srcs = all_sources(field, cfg)
            q_true = source_strengths(field, cfg)
            zq = zz if cfg.env_3d else None
            q_est = invert_fluxes(p, c, srcs, field.wind, cfg, z=zq)
            observed = source_observability(p, srcs, field.wind, cfg, z=zq)
            rel = jnp.abs(q_est - q_true) / q_true
            return q_est, q_true, rel, observed

        return jax.vmap(one)(env_state.field, pts, zs, concs)

    q_est, q_true, rel, observed = jax.jit(run)(reset_keys, k_act, k_noise)
    rel = np.asarray(rel)
    observed = np.asarray(observed)
    rel_obs = rel[observed]
    return {
        "episodes": n,
        "sources": int(q_true.shape[1]),
        "observed_frac": float(observed.mean()),
        "mean_rel_error": float(rel_obs.mean()) if rel_obs.size else float("nan"),
        "median_rel_error": float(np.median(rel_obs)) if rel_obs.size else float("nan"),
        "p90_rel_error": float(np.quantile(rel_obs, 0.9)) if rel_obs.size else float("nan"),
        "within_20pct": float((rel_obs < 0.2).mean()) if rel_obs.size else 0.0,
    }
