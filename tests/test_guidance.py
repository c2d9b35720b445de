"""Terminal-guidance tests: trilateration accuracy + guided-eval behavior.

The guide (evaluation/guidance.py) exists because every policy — ours and
both of the reference's committed runs — lands goal-ball crossings on a
~uniform chord (success-case deviation 34.3-34.8 px in all runs); it
phase-controls the final step from an online least-squares source fit.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tpu_plume.core.config import EnvConfig, EvalConfig
from tpu_plume.env import methane
from tpu_plume.evaluation import evaluate_policy
from tpu_plume.evaluation.guidance import (
    GuideConfig,
    guide_init,
    guide_step,
    make_guide,
)
from tpu_plume.models import ActorCritic


def test_trilateration_recovers_source():
    """Noiseless samples of the isotropic model pin the source to <1 px."""
    cfg = EnvConfig(turbulence_intensity=1e-9)
    gcfg = GuideConfig(min_samples=5)
    src = jnp.array([312.0, 187.0])
    sigma2 = cfg.plume_sigma**2

    gs = guide_init(gcfg)
    rng = np.random.default_rng(0)
    step = jax.jit(lambda gs, p, c, a: guide_step(gs, p, c, a, cfg, gcfg))
    for _ in range(24):
        pos = jnp.asarray(src + rng.uniform(-70, 70, 2), jnp.float32)
        d2 = jnp.sum((pos - src) ** 2)
        conc = cfg.conc_peak * jnp.exp(-d2 / (2 * sigma2))
        gs, action, on = step(gs, pos, conc, jnp.int32(0))
    assert bool(gs.est_ok)
    assert float(jnp.linalg.norm(gs.est - src)) < 1.0


def test_guide_fit_rejects_ill_conditioned():
    """Collinear samples (zero spread on one axis) must never validate the
    fit — the posterior-se gate blocks est_ok (hover may still engage;
    that IS the designed response to a degenerate sample geometry)."""
    cfg = EnvConfig(turbulence_intensity=1e-9)
    gcfg = GuideConfig(min_samples=5)
    src = jnp.array([250.0, 250.0])
    sigma2 = cfg.plume_sigma**2
    gs = guide_init(gcfg)
    step = jax.jit(lambda gs, p, c, a: guide_step(gs, p, c, a, cfg, gcfg))
    for x in np.linspace(150, 190, 20):
        pos = jnp.array([x, 250.0], jnp.float32)  # one flight line
        d2 = jnp.sum((pos - src) ** 2)
        conc = cfg.conc_peak * jnp.exp(-d2 / (2 * sigma2))
        gs, action, on = step(gs, pos, conc, jnp.int32(0))
        assert not bool(gs.est_ok)


def test_guide_phase_controls_crossing():
    """With a converged estimate, the guide never takes a shallow crossing
    step when a set-up move exists: from any position outside the ball the
    chosen action either lands <= deep_target or stays outside."""
    cfg = EnvConfig(turbulence_intensity=1e-9)
    gcfg = GuideConfig(min_samples=5)
    src = jnp.array([250.0, 250.0])
    sigma2 = cfg.plume_sigma**2
    gs = guide_init(gcfg)
    step = jax.jit(lambda gs, p, c, a: guide_step(gs, p, c, a, cfg, gcfg))
    rng = np.random.default_rng(1)
    for _ in range(20):
        pos = jnp.asarray(src + rng.uniform(-60, 60, 2), jnp.float32)
        d2 = jnp.sum((pos - src) ** 2)
        conc = cfg.conc_peak * jnp.exp(-d2 / (2 * sigma2))
        gs, _, _ = step(gs, pos, conc, jnp.int32(0))
    assert bool(gs.est_ok)

    deltas = np.asarray(methane._action_delta(jnp.arange(5), cfg))
    for ang in np.linspace(0, 2 * np.pi, 13):
        for dist in (52.0, 60.0, 68.0, 74.0):
            pos = jnp.asarray(
                src + dist * jnp.array([np.cos(ang), np.sin(ang)]), jnp.float32
            )
            d2 = jnp.sum((pos - src) ** 2)
            conc = cfg.conc_peak * jnp.exp(-d2 / (2 * sigma2))
            gs2, action, on = step(gs, pos, conc, jnp.int32(0))
            assert bool(on)
            land = np.linalg.norm(
                np.asarray(pos) + deltas[int(action)] - np.asarray(src)
            )
            # a crossing must land within the acceptance band (deep_take);
            # anything shallower requires staying outside the ball
            assert land <= gcfg.deep_take + 1.5 or land > gcfg.terminate_radius, (
                ang, dist, land,
            )


def test_guide_commit_latch_and_radial_calibration():
    """Round-3 dive commitment: once the fit has validated, the guide keeps
    steering even when the gates flicker off (measured +2.7pp s@40), and
    the radial calibration EMA tracks the (est-implied - pointwise) offset
    of high-SNR reads (measured +7.3pp with the deep_take band).

    phantom_patience is disabled here: the synthetic convergence loop feeds
    in-ball positions (impossible in a live episode, which would have
    terminated) that would otherwise trip the refutation."""
    cfg = EnvConfig(turbulence_intensity=1e-9)
    gcfg = GuideConfig(min_samples=5, phantom_patience=0)
    src = jnp.array([250.0, 250.0])
    sigma2 = cfg.plume_sigma**2
    gs = guide_init(gcfg)
    step = jax.jit(lambda gs, p, c, a: guide_step(gs, p, c, a, cfg, gcfg))
    rng = np.random.default_rng(3)
    for _ in range(20):
        pos = jnp.asarray(src + rng.uniform(-60, 60, 2), jnp.float32)
        d2 = jnp.sum((pos - src) ** 2)
        conc = cfg.conc_peak * jnp.exp(-d2 / (2 * sigma2))
        gs, _, _ = step(gs, pos, conc, jnp.int32(0))
    assert bool(gs.est_ok) and bool(gs.committed)
    # noiseless reads against a converged estimate: calibration ~0
    assert bool(gs.bias_ok)
    assert abs(float(gs.rad_bias)) < 2.0

    # wreck the sample buffer so the fit gates fail -> est_ok drops, but
    # the committed latch keeps the guide overriding with est_good
    gs_bad = gs.replace(w_buf=jnp.zeros_like(gs.w_buf))
    pos = jnp.asarray(src + jnp.array([60.0, 0.0]), jnp.float32)
    conc = cfg.conc_peak * jnp.exp(-(60.0**2) / (2 * sigma2))
    gs2, action, overriding = step(gs_bad, pos, conc, jnp.int32(0))
    assert not bool(gs2.est_ok)
    assert bool(gs2.committed) and bool(overriding)
    # the committed action is still the phase controller: from 60 px out
    # it must not cross shallow
    deltas = np.asarray(methane._action_delta(jnp.arange(5), cfg))
    land = np.linalg.norm(np.asarray(pos) + deltas[int(action)] - np.asarray(src))
    assert land <= gcfg.deep_take + 1.5 or land > gcfg.terminate_radius

    # a biased estimate is corrected by the pointwise read: shift est_good
    # outward by 6 px (with the fit gates down, so the latched est_good is
    # what steers) and verify the EMA learns a positive offset
    est_shift = gs.est + jnp.array([6.0, 0.0])
    gs3 = gs.replace(est_good=est_shift, w_buf=jnp.zeros_like(gs.w_buf))
    pos = jnp.asarray(src + jnp.array([-60.0, 0.0]), jnp.float32)
    conc = cfg.conc_peak * jnp.exp(-(60.0**2) / (2 * sigma2))
    gs4, _, _ = step(gs3, pos, conc, jnp.int32(0))
    assert float(gs4.rad_bias) > 1.5


def test_guide_phantom_refutation():
    """A committed fit that claims the agent is inside the terminate ball
    while the episode is still alive is refuted by the environment: after
    phantom_patience such steps the guide un-commits and wipes the sample
    weights so trilateration restarts."""
    cfg = EnvConfig(turbulence_intensity=1e-9)
    gcfg = GuideConfig(min_samples=5)
    src = jnp.array([250.0, 250.0])
    sigma2 = cfg.plume_sigma**2
    gs = guide_init(gcfg)
    step = jax.jit(lambda gs, p, c, a: guide_step(gs, p, c, a, cfg, gcfg))
    rng = np.random.default_rng(5)
    for _ in range(20):
        # converge from the safe annulus only (live-episode-consistent)
        ang = rng.uniform(0, 2 * np.pi)
        d = rng.uniform(52, 85)
        pos = jnp.asarray(
            src + d * jnp.array([np.cos(ang), np.sin(ang)]), jnp.float32)
        conc = cfg.conc_peak * jnp.exp(-(d * d) / (2 * sigma2))
        gs, _, _ = step(gs, pos, conc, jnp.int32(0))
    assert bool(gs.committed)

    # teleport the "estimate" far from the true source by feeding samples
    # consistent with a phantom: the agent sits where the committed
    # estimate says d ~ 10 (inside the ball) yet the episode continues
    phantom_pos = gs.est + jnp.array([10.0, 0.0])
    d_true = float(jnp.linalg.norm(phantom_pos - src))
    conc = cfg.conc_peak * jnp.exp(-(d_true**2) / (2 * sigma2))
    for _ in range(gcfg.phantom_patience):
        assert bool(gs.committed)
        gs, _, _ = step(gs, jnp.asarray(phantom_pos, jnp.float32), conc,
                        jnp.int32(0))
    assert not bool(gs.committed)
    assert float(gs.w_buf.sum()) == 0.0  # fit restarts


def _raster_apply(cfg):
    """Memoryless boustrophedon sweep expressed as logits of obs — a
    deterministic find-the-plume surrogate so the e2e test doesn't depend
    on a trained checkpoint.  Actions: 0 stay, 1 +y, 2 -y, 3 +x, 4 -x."""
    g = float(cfg.grid_size)

    def apply_fn(params, obs):
        x = obs[..., 0] * g
        y = obs[..., 1] * g
        band = jnp.floor(y / 35.0).astype(jnp.int32)
        going_right = band % 2 == 0
        at_right = x >= g - 30.0
        at_left = x <= 30.0
        turn = jnp.where(going_right, at_right, at_left)
        action = jnp.where(turn, 1, jnp.where(going_right, 3, 4))
        logits = jax.nn.one_hot(action, cfg.num_actions) * 50.0
        return logits, jnp.zeros(obs.shape[:-1])

    return apply_fn


def test_guided_eval_beats_chord_geometry():
    """End-to-end: the guided raster converts shallow chord crossings into
    hover-then-dive deep landings — success rate well above the unguided
    ~28% and a deep (<=36 px) landing cluster that chord geometry can't
    produce (measured: guided 0.51-0.56 vs plain 0.28 at 96 episodes)."""
    cfg = EnvConfig(max_steps=800, plume_sigma=500 / 16)
    ev = EvalConfig(episodes=64, success_distance=40.0)
    apply_fn = _raster_apply(cfg)

    m_guided = evaluate_policy(
        {}, apply_fn, cfg, ev, jax.random.PRNGKey(1),
        guide=make_guide(cfg),
    )
    m_plain = evaluate_policy({}, apply_fn, cfg, ev, jax.random.PRNGKey(1))
    dev = m_guided.deviations
    assert m_guided.success.sum() >= 20
    assert m_guided.success.mean() > m_plain.success.mean() + 0.1
    # the deep-landing cluster: many successes land at <= 36 px, which an
    # uncontrolled 25-px-step chord crossing essentially never does in bulk
    assert (dev <= 36).sum() >= 0.25 * (dev <= 50).sum()


def test_guided_precision_protocol():
    """Goal-radius-5 bullseye: with dive geometry scaled to the terminator
    (deep 4, setup 28, tight se), the guided surveyor hits the 5-px ball
    most of the time where the raw policy almost never does (measured
    0.84 vs 0.14 at 96 episodes)."""
    cfg = EnvConfig(max_steps=1000, plume_sigma=500 / 16)
    ev = EvalConfig(episodes=48, success_distance=40.0)
    apply_fn = _raster_apply(cfg)
    r = 5.0
    deep = min(30.0, 0.8 * r)
    g = GuideConfig(
        terminate_radius=r, deep_target=deep,
        setup_distance=deep + 24.0, max_se=max(1.5, 0.8 * deep),
    )
    mg = evaluate_policy(
        {}, apply_fn, cfg, ev, jax.random.PRNGKey(1), goal_radius=r,
        guide=make_guide(cfg, g),
    )
    assert (mg.deviations <= 5.0).mean() >= 0.5


def test_make_guide_gates_unsupported_models():
    import pytest

    with pytest.raises(ValueError):
        make_guide(EnvConfig(plume_model="gridded"))
    with pytest.raises(ValueError):
        make_guide(dataclasses.replace(EnvConfig(), env_3d=True))
    # anisotropic now dispatches to the Gauss-Newton model fit
    init, step = make_guide(EnvConfig(plume_model="anisotropic"))
    assert init is not None and callable(step)


def test_derived_config_matches_tuned_at_v2_0_physics():
    """derive_guide_config must reproduce the hand-tuned GuideConfig at the
    physics it was tuned on (sigma=31.25, TI=3, peak=100, move=25,
    terminate=50, success@40) — the derivation is a generalization, not a
    silent retune."""
    from tpu_plume.evaluation.guidance import derive_guide_config

    d = derive_guide_config(EnvConfig(plume_sigma=500 / 16))
    t = GuideConfig()
    for field, tol in [
        ("conc_floor", 0.15), ("enter_weak", 0.15), ("enter_strong", 0.15),
        ("resid_floor", 0.2), ("cross_check_conc", 0.15),
        ("cross_check_tol", 0.2), ("radial_move_min", 0.05),
        ("deep_target", 0.01), ("setup_distance", 0.01), ("max_se", 0.01),
        ("probe_in_min", 0.01), ("terminate_radius", 0.0),
    ]:
        dv, tv = getattr(d, field), getattr(t, field)
        assert abs(dv - tv) <= tol * max(abs(tv), 1e-9) + 1e-9, (
            f"{field}: derived {dv} vs tuned {tv}"
        )


def test_derived_config_v2_1_feasibility():
    """sigma=15 under the radius-50 protocol has NO readable signal outside
    the goal ball — the derivation must refuse loudly; under the precision
    protocol (terminate 5) it must produce a working config."""
    import pytest

    from tpu_plume.evaluation.guidance import derive_guide_config

    v21 = EnvConfig(plume_sigma=15.0)
    with pytest.raises(ValueError, match="infeasible"):
        derive_guide_config(v21, terminate_radius=50.0)

    g = derive_guide_config(v21, terminate_radius=5.0, success_radius=50.0)
    assert g.terminate_radius == 5.0
    assert g.probe_in_min < 36.0   # probes happen inside the readable zone
    # px tolerances shrink with sigma (sharper plume -> tighter inversion)
    assert g.resid_floor < GuideConfig().resid_floor


def test_guided_precision_on_v2_1_preset():
    """The derived guide must work one preset away from where the constants
    were tuned (round-2 VERDICT weak #2): sigma-15 plume, goal radius 5 —
    the raster surveyor under derived guidance lands bullseyes."""
    cfg = EnvConfig(max_steps=1000, plume_sigma=15.0)
    ev = EvalConfig(episodes=48, success_distance=50.0)
    apply_fn = _raster_apply(cfg)
    mg = evaluate_policy(
        {}, apply_fn, cfg, ev, jax.random.PRNGKey(1), goal_radius=5.0,
        guide=make_guide(cfg, terminate_radius=5.0, success_radius=50.0),
    )
    assert (mg.deviations <= 5.0).mean() >= 0.4


# ---- round-4 decomposition hooks (scripts/guide_truth.py) -----------------


def _converged_state(cfg, gcfg, src, seed=0, n=24):
    gs = guide_init(gcfg)
    rng = np.random.default_rng(seed)
    step = jax.jit(lambda gs, p, c, a: guide_step(gs, p, c, a, cfg, gcfg))
    sigma2 = cfg.plume_sigma**2
    for _ in range(n):
        pos = jnp.asarray(src + rng.uniform(-70, 70, 2), jnp.float32)
        d2 = jnp.sum((pos - src) ** 2)
        conc = cfg.conc_peak * jnp.exp(-d2 / (2 * sigma2))
        gs, _, _ = step(gs, pos, conc, jnp.int32(0))
    assert bool(gs.est_ok)
    return gs


def test_truth_injection_steers_to_truth():
    """The diagnostic hook (guide_step(true_source=...)) must keep the
    engagement FSM (here: a validated fit steers) but drive the phase
    lookahead with the TRUE source — and must disable the radial
    calibration (truth needs none)."""
    cfg = EnvConfig(turbulence_intensity=1e-9)
    gcfg = GuideConfig(min_samples=5)
    src = jnp.array([250.0, 250.0])
    truth = jnp.array([490.0, 250.0, 0.0])  # 240 px east of the fit's source
    gs = _converged_state(cfg, gcfg, src)

    # 120 px from each, on the line between them: approaching one means
    # retreating from the other — the two arms must pick opposite moves
    pos = jnp.array([370.0, 250.0], jnp.float32)
    d2 = jnp.sum((pos - src) ** 2)
    conc = cfg.conc_peak * jnp.exp(-d2 / (2 * cfg.plume_sigma**2))

    _, a_est, on_e = jax.jit(
        lambda g: guide_step(g, pos, conc, jnp.int32(0), cfg, gcfg))(gs)
    gs_t, a_tru, on_t = jax.jit(
        lambda g: guide_step(g, pos, conc, jnp.int32(0), cfg, gcfg,
                             true_source=truth))(gs)
    assert bool(on_e) and bool(on_t)
    deltas = np.asarray(methane._action_delta(jnp.arange(5), cfg))[:, :2]
    land_e = np.asarray(pos) + deltas[int(a_est)]
    land_t = np.asarray(pos) + deltas[int(a_tru)]
    # the injected step moves toward truth; the plain step toward the fit
    assert np.linalg.norm(land_t - np.asarray(truth[:2])) < np.linalg.norm(
        np.asarray(pos) - np.asarray(truth[:2]))
    assert np.linalg.norm(land_e - np.asarray(src)) < np.linalg.norm(
        np.asarray(pos) - np.asarray(src))
    # calibration frozen on truth (the plain path may keep updating it)
    assert float(gs_t.rad_bias) == float(gs.rad_bias)


def test_truth_injection_harness_hook():
    """evaluate_policy feeds the episode's true source to guides marked
    needs_source — the truth arm of the round-4 decomposition must score
    at least as well as the estimate arm on the same seeds."""
    cfg = EnvConfig(max_steps=800, plume_sigma=500 / 16)
    ev = EvalConfig(episodes=48, success_distance=40.0)
    apply_fn = _raster_apply(cfg)
    init, step_fn = make_guide(cfg)
    gcfg = GuideConfig()

    def truth_fn(gs, pos, conc, act, source):
        return guide_step(gs, pos, conc, act, cfg, gcfg, true_source=source)

    truth_fn.needs_source = True
    m_tru = evaluate_policy(
        {}, apply_fn, cfg, ev, jax.random.PRNGKey(1), guide=(init, truth_fn))
    m_est = evaluate_policy(
        {}, apply_fn, cfg, ev, jax.random.PRNGKey(1), guide=(init, step_fn))
    assert m_tru.success.mean() >= m_est.success.mean() - 1e-6
    assert m_tru.success.sum() >= 20


def test_round4_knobs_compile_and_run():
    """The round-4 A/B knobs (hover veto, est-aware signs, tangential band,
    committed-estimate EMA) must jit, vmap, and keep the guide functional —
    they ship default-off but remain measured, documented levers."""
    cfg = EnvConfig(turbulence_intensity=1e-9)
    gcfg = GuideConfig(
        min_samples=5, hover_veto_margin=5.0, est_signs=True,
        tangential_band=10.0, est_ema=0.3,
    )
    src = jnp.array([250.0, 250.0])
    gs = _converged_state(cfg, gcfg, src)
    assert float(jnp.linalg.norm(gs.est - src)) < 2.0

    # vmapped batch step (the harness' calling convention)
    B = 4
    gsb = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), gs)
    pos = jnp.broadcast_to(jnp.array([320.0, 250.0]), (B, 2))
    conc = jnp.full((B,), 30.0)
    act = jnp.zeros((B,), jnp.int32)
    step = jax.jit(jax.vmap(
        lambda g, p, c, a: guide_step(g, p, c, a, cfg, gcfg)))
    gsb2, actions, on = step(gsb, pos, conc, act)
    assert actions.shape == (B,)
    assert bool(jnp.all((actions >= 0) & (actions < cfg.num_actions)))
    assert bool(jnp.all(jnp.isfinite(gsb2.est)))


def test_est_ema_blends_committed_refresh():
    """With est_ema < 1, a validated refresh during a committed dive BLENDS
    into est_good instead of replacing it."""
    cfg = EnvConfig(turbulence_intensity=1e-9)
    gcfg = GuideConfig(min_samples=5, est_ema=0.25)
    src = jnp.array([250.0, 250.0])
    gs = _converged_state(cfg, gcfg, src)
    offset = jnp.array([12.0, -8.0])
    gs = gs.replace(committed=jnp.ones((), bool), est_good=gs.est + offset)

    pos = jnp.asarray(src + jnp.array([55.0, 30.0]), jnp.float32)
    d2 = jnp.sum((pos - src) ** 2)
    conc = cfg.conc_peak * jnp.exp(-d2 / (2 * cfg.plume_sigma**2))
    gs2, _, _ = jax.jit(
        lambda g: guide_step(g, pos, conc, jnp.int32(0), cfg, gcfg))(gs)
    # fit revalidates at ~src: est_good' ~= 0.75*(src+offset) + 0.25*src
    expect = np.asarray(gs.est + 0.75 * offset)
    assert np.linalg.norm(np.asarray(gs2.est_good) - expect) < 2.0
