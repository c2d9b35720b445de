"""Anisotropic model-fit guidance: Gauss-Newton (source, wind-angle)
recovery, se gating, and closed-loop engagement on the wrf physics."""

import jax
import jax.numpy as jnp
import numpy as np

import dataclasses

from tpu_plume.core.config import EnvConfig, EvalConfig
from tpu_plume.evaluation import evaluate_policy
from tpu_plume.evaluation.aniso_fit import (
    AnisoGuideConfig,
    derive_aniso_config,
    fit_aniso,
    make_aniso_guide,
    make_model_n,
)
from tpu_plume.evaluation.guidance import make_guide


def _wrf_cfg(**kw):
    return EnvConfig(
        plume_model="anisotropic", plume_sigma=15.0,
        wind_speed_range=(1.0, 4.0), **kw,
    )


def test_fit_recovers_source_and_wind_angle():
    """Noiseless model samples on a crosswind-sweeping path pin the source
    to ~1 px and the wind angle to a few degrees."""
    cfg = _wrf_cfg()
    gcfg = AnisoGuideConfig()
    model_n = make_model_n(cfg)
    src = jnp.array([220.0, 310.0])
    theta = 0.9
    u = jnp.array([np.cos(theta), np.sin(theta)])
    v = jnp.array([-np.sin(theta), np.cos(theta)])
    # samples: three crosswind transects at different downwind distances
    pts = []
    for d in (80.0, 140.0, 220.0):
        for cw in np.linspace(-25.0, 25.0, 9):
            pts.append(src + d * u + cw * v)
    pos = jnp.stack(pts)
    c = model_n(pos, src, theta)
    keep = c >= 0.03
    w = keep.astype(jnp.float32)
    est, th, se, n_eff = fit_aniso(pos, c, w, cfg, gcfg)
    assert int(n_eff) >= gcfg.min_samples
    assert float(jnp.linalg.norm(est - src)) < 2.0
    ang_err = np.abs((float(th) - theta + np.pi) % (2 * np.pi) - np.pi)
    assert ang_err < 0.1
    # se is floored at the known noise variance, so even noiseless data
    # reports a finite (honest) posterior — it must pass the steer gate
    assert float(se) <= gcfg.max_se


def test_fit_se_flags_degenerate_geometry():
    """All samples at one point: the posterior se must blow past any
    sane gate (no false validation)."""
    cfg = _wrf_cfg()
    gcfg = AnisoGuideConfig()
    pos = jnp.tile(jnp.array([[250.0, 250.0]]), (32, 1))
    c = jnp.full((32,), 0.2)
    w = jnp.ones((32,))
    _, _, se, _ = fit_aniso(pos, c, w, cfg, gcfg)
    assert float(se) > gcfg.max_se


def test_aniso_guide_step_shapes_and_gating():
    """The guide ingests samples, stays deferent before validation, and
    the step is jittable."""
    cfg = _wrf_cfg()
    init, step = make_aniso_guide(cfg)
    step = jax.jit(step)
    gs = init
    pos = jnp.array([100.0, 100.0])
    gs, action, overriding = step(gs, pos, jnp.float32(0.0), jnp.int32(2))
    assert int(action) == 2 and not bool(overriding)
    assert int(gs.count) == 0  # sub-floor read not ingested


def test_derive_small_terminator_dive_geometry():
    """The derived dive geometry must stay feasible at ANY terminator
    (the radius-5 precision protocol found an undiveable setup ring and a
    never-firing phantom trigger; both are now derivation invariants)."""
    cfg = _wrf_cfg()
    move = cfg.grid_size * cfg.move_frac
    for r in (5.0, 25.0, 50.0):
        g = derive_aniso_config(cfg, terminate_radius=r)
        assert g.deep_take > 0
        # a radial step from the setup ring lands inside the take band —
        # otherwise clean dives cannot exist geometrically
        assert g.setup_distance - move <= g.deep_take
        # the ring itself sits outside the terminator
        assert g.setup_distance > r
        # the presence-falsification trigger: active only where the miss
        # depth can exceed the estimate's error scale (r=50), self-disabled
        # where est err ~ ball size (r=5; commit_timeout covers wrong fits)
        margin_eff = max(min(g.phantom_margin, 0.1 * r),
                         g.phantom_se_mult * g.max_se)
        if r >= 50.0:
            assert r - margin_eff > 0
        if r <= 5.0:
            assert r - margin_eff < 0
            assert g.commit_timeout > 0


def _feed_transect(step, gs, src, theta, cfg, noise_mean):
    """Drive the guide along three crosswind transects of model reads
    around ``src`` (the geometry that identifies the 3-parameter fit)."""
    model_n = make_model_n(cfg)
    u = jnp.array([np.cos(theta), np.sin(theta)])
    v = jnp.array([-np.sin(theta), np.cos(theta)])
    pts = [src + d * u + cw * v
           for d in (80.0, 140.0, 220.0)
           for cw in np.linspace(-25.0, 25.0, 9)]
    out = (gs, jnp.int32(0), jnp.zeros((), bool))
    for p in pts:
        c_n = model_n(p[None, :], src, theta)[0]
        conc = c_n * cfg.conc_peak + noise_mean
        out = step(out[0], p, conc, jnp.int32(2))
    return out


def test_phantom_ban_and_concession():
    """Environment-falsified fits are banned and the guide concedes after
    phantom_max_refutes (the radius-5 wrong-theta orbit fixes)."""
    cfg = _wrf_cfg(max_steps=500)
    noise_mean = cfg.turbulence_intensity * (0.7978845608 + 0.1)
    base = derive_aniso_config(cfg, terminate_radius=5.0)

    def run(max_refutes, second_src_offset):
        # phantom_se_mult=0 re-arms the presence path at this small
        # terminator so the ban/concession machinery itself is exercised;
        # null_buffer=0 isolates the FSM from the censored-data fit
        # (which would otherwise repel the refit off the dead center
        # BEFORE the ban is consulted — test_null_reads_repel_dead_center)
        gcfg = dataclasses.replace(
            base, phantom_patience=2, phantom_max_refutes=max_refutes,
            phantom_se_mult=0.0, null_buffer=0)
        gs, step = make_aniso_guide(cfg, gcfg=gcfg)
        step = jax.jit(step)
        src, theta = jnp.array([220.0, 310.0]), 0.9
        gs, _, over = _feed_transect(step, gs, src, theta, cfg, noise_mean)
        assert bool(over) and bool(gs.committed)  # fit validated, steering
        # stand inside the estimated terminate ball WITHOUT the episode
        # ending: after patience votes the environment has refuted the fit
        for _ in range(gcfg.phantom_patience + 1):
            gs, _, over = step(gs, gs.est_good, jnp.float32(0.0), jnp.int32(2))
        assert int(gs.refutes) == 1 and bool(gs.have_bad)
        assert not bool(gs.committed) and not bool(over)
        assert float(gs.w_buf.sum()) == 0.0  # samples wiped for a refit
        bad = np.asarray(gs.bad_est)
        # refit from fresh samples around a (possibly shifted) source
        src2 = src + second_src_offset
        gs, _, over = _feed_transect(step, gs, src2, theta, cfg, noise_mean)
        # the refit itself is geometrically valid either way...
        _, _, se, n_eff = fit_aniso(gs.pos_buf, gs.c_buf, gs.w_buf, cfg, gcfg)
        assert int(n_eff) >= gcfg.min_samples and float(se) <= gcfg.max_se
        return gs, bool(over), bad

    # ban: a revalidated fit at the refuted center must not steer
    gs, over, bad = run(max_refutes=0, second_src_offset=jnp.zeros(2))
    assert np.linalg.norm(np.asarray(gs.est) - bad) <= base.phantom_ban_radius
    assert not over and not bool(gs.est_ok)
    # ...but the ban ball is PROOF-sized (terminate_radius - d_min ~ 5 px
    # here, the agent refuted from the estimate's center): a fit 8 px off
    # the refuted center — e.g. the TRUE source after an early slightly-off
    # fit — stays eligible and steers again
    gs, over, bad = run(max_refutes=0,
                        second_src_offset=jnp.array([8.0, 0.0]))
    assert over and bool(gs.committed)
    # concession: after max_refutes, even a NON-banned fit must not steer
    gs, over, bad = run(max_refutes=1,
                        second_src_offset=jnp.array([60.0, 0.0]))
    assert np.linalg.norm(np.asarray(gs.est) - bad) > base.phantom_ban_radius
    assert not over
    # control: with the cap not yet reached, the shifted refit steers again
    _, over, _ = run(max_refutes=3, second_src_offset=jnp.array([60.0, 0.0]))
    assert over


def test_commit_age_refutation_releases_without_ban():
    """A commit that outlives commit_timeout without terminating is
    refuted (samples wiped, control released) but the center is NOT
    banned — only falsification-by-presence bans (radius-5 diag: wrong
    fits can orbit the setup ring forever without entering the ball)."""
    cfg = _wrf_cfg(max_steps=500)
    noise_mean = cfg.turbulence_intensity * (0.7978845608 + 0.1)
    gcfg = dataclasses.replace(
        derive_aniso_config(cfg, terminate_radius=5.0), commit_timeout=20)
    gs, step = make_aniso_guide(cfg, gcfg=gcfg)
    step = jax.jit(step)
    src, theta = jnp.array([220.0, 310.0]), 0.9
    gs, _, over = _feed_transect(step, gs, src, theta, cfg, noise_mean)
    assert bool(over) and bool(gs.committed)
    # orbit OUTSIDE the est ball (no phantom votes) with sub-floor reads
    far = gs.est_good + jnp.array([40.0, 0.0])
    for _ in range(gcfg.commit_timeout + 2):
        gs, _, over = step(gs, far, jnp.float32(0.0), jnp.int32(2))
    assert int(gs.refutes) == 1 and not bool(gs.committed) and not bool(over)
    assert not bool(gs.have_bad)  # stale != proof the ball is source-free
    assert float(gs.w_buf.sum()) == 0.0
    # stale wipes do NOT burn the concession budget (stale_concedes=False
    # default): only presence refutations support the continuum argument
    assert int(gs.p_refutes) == 0


def test_stale_wipes_never_concede_by_default():
    """Repeated commit-age refutations keep recycling the window — the
    guide re-commits and steers again past phantom_max_refutes stale
    cycles (radius-5 measurement: the stale-counting cap conceded
    winnable episodes; 68.8% -> 76.2% bullseye when lifted).  With
    stale_concedes=True the old budget-burning semantics return."""
    cfg = _wrf_cfg(max_steps=500)
    noise_mean = cfg.turbulence_intensity * (0.7978845608 + 0.1)

    def cycles(stale_concedes):
        gcfg = dataclasses.replace(
            derive_aniso_config(cfg, terminate_radius=5.0),
            commit_timeout=20, phantom_max_refutes=2,
            stale_concedes=stale_concedes)
        gs, step = make_aniso_guide(cfg, gcfg=gcfg)
        step = jax.jit(step)
        src, theta = jnp.array([220.0, 310.0]), 0.9
        steers = []
        for _ in range(3):  # 3 windows > the cap of 2
            gs, _, over = _feed_transect(step, gs, src, theta, cfg,
                                         noise_mean)
            steers.append(bool(over))
            far = gs.est_good + jnp.array([40.0, 0.0])
            for _ in range(gcfg.commit_timeout + 2):
                gs, _, over = step(gs, far, jnp.float32(0.0), jnp.int32(2))
        return steers, int(gs.refutes), int(gs.p_refutes)

    steers, refutes, p_refutes = cycles(stale_concedes=False)
    assert steers == [True, True, True]  # every window re-validates
    assert refutes == 3 and p_refutes == 0
    steers, refutes, _ = cycles(stale_concedes=True)
    assert steers == [True, True, False]  # conceded after the cap
    assert refutes >= 2


def test_null_reads_penalize_phantom_modes():
    """Censored-data hinge residuals: consistent nulls (true dead zones,
    the model predicts ~0 there) leave the fit untouched.  Nulls act
    through the MULTI-START SELECTION — the kernel clips to 1.0 near a
    core, so the hinge carries loss but no gradient there, and with
    clean unimodal data every start converges to the same minimum; the
    mode-discrimination effect is pinned end-to-end by
    test_null_reads_repel_dead_center."""
    cfg = _wrf_cfg(max_steps=500)
    gcfg = derive_aniso_config(cfg, terminate_radius=5.0)
    src, theta = jnp.array([220.0, 310.0]), 0.9
    model_n = make_model_n(cfg)
    u = jnp.array([np.cos(theta), np.sin(theta)])
    v = jnp.array([-np.sin(theta), np.cos(theta)])
    pts = jnp.stack([src + d * u + cw * v
                     for d in (80.0, 140.0, 220.0)
                     for cw in np.linspace(-25.0, 25.0, 9)])
    c = model_n(pts, src, theta)
    w = jnp.ones(pts.shape[0])
    est0, _, _, _ = fit_aniso(pts, c, w, cfg, gcfg)  # no-null baseline
    far = src + 120.0 * v
    est, _, se, _ = fit_aniso(pts, c, w, cfg, gcfg,
                              null_pos=jnp.tile(far[None, :], (8, 1)),
                              null_w=jnp.ones(8))
    assert np.linalg.norm(np.asarray(est) - np.asarray(est0)) < 1.0
    assert float(se) <= gcfg.max_se


def test_null_reads_repel_dead_center():
    """End-to-end: after the agent stands at its own validated estimate
    reading zeros (recording nulls), the refit no longer re-selects that
    center — the estimator itself avoids the proven dead zone, before
    any FSM ban is consulted."""
    cfg = _wrf_cfg(max_steps=500)
    noise_mean = cfg.turbulence_intensity * (0.7978845608 + 0.1)
    gcfg = dataclasses.replace(
        derive_aniso_config(cfg, terminate_radius=5.0),
        phantom_patience=2, phantom_se_mult=0.0, phantom_max_refutes=0,
        null_buffer=64)
    gs, step = make_aniso_guide(cfg, gcfg=gcfg)
    step = jax.jit(step)
    src, theta = jnp.array([220.0, 310.0]), 0.9
    gs, _, over = _feed_transect(step, gs, src, theta, cfg, noise_mean)
    assert bool(over) and bool(gs.committed)
    dead = np.asarray(gs.est_good)
    for _ in range(gcfg.phantom_patience + 1):
        gs, _, over = step(gs, gs.est_good, jnp.float32(0.0), jnp.int32(2))
    assert int(gs.null_count) > 0  # dead-zone reads were recorded
    gs, _, over = _feed_transect(step, gs, src, theta, cfg, noise_mean)
    assert np.linalg.norm(np.asarray(gs.est) - dead) > gcfg.phantom_ban_radius


def test_domain_gate_rejects_out_of_domain_source():
    """A fit whose estimate lies outside the padded spawn domain never
    validates (sources spawn in [padding, grid-padding]^2 —
    fields/analytic.py:53-55); with the gate disabled the same synthetic
    geometry validates and steers."""
    cfg = _wrf_cfg(max_steps=500)
    noise_mean = cfg.turbulence_intensity * (0.7978845608 + 0.1)
    src, theta = jnp.array([20.0, 250.0]), 0.0  # 30 px outside the domain

    def run(slack):
        gcfg = dataclasses.replace(
            derive_aniso_config(cfg, terminate_radius=5.0),
            domain_slack=slack)
        gs, step = make_aniso_guide(cfg, gcfg=gcfg)
        return _feed_transect(jax.jit(step), gs, src, theta, cfg,
                              noise_mean)

    gs, _, over = run(slack=-1.0)
    assert bool(over)  # ungated: the synthetic off-domain fit steers
    est = np.asarray(gs.est)
    assert np.linalg.norm(est - np.asarray(src)) < 20.0
    assert est[0] < cfg.source_padding - 8.0  # and it IS out of domain
    # gated: a validated estimate is ALWAYS in-domain — either the
    # selection found an in-domain mode that genuinely fits, or nothing
    # validates (the true source here is physically impossible env-side)
    gs, _, over = run(slack=8.0)
    if bool(over):
        est = np.asarray(gs.est)
        lo, hi = cfg.source_padding - 8.0, cfg.grid_size - cfg.source_padding + 8.0
        assert (est >= lo).all() and (est <= hi).all()
    else:
        assert not bool(gs.committed)


def test_guided_aniso_eval_engages_and_does_not_regress():
    """Closed-loop on the wrf physics with a scripted raster surveyor:
    the fit validates on a meaningful fraction of episodes and guided
    success is at least plain success (the guide only overrides on a
    validated <few-px fit)."""
    cfg = _wrf_cfg(max_steps=500)
    ev = EvalConfig(episodes=32, success_distance=40.0)
    g = float(cfg.grid_size)

    def raster_apply(params, obs):
        # memoryless boustrophedon sweep (same surrogate as test_guidance)
        x = obs[..., 0] * g
        y = obs[..., 1] * g
        band = jnp.floor(y / 35.0).astype(jnp.int32)
        going_right = band % 2 == 0
        turn = jnp.where(going_right, x >= g - 30.0, x <= 30.0)
        act = jnp.where(turn, 1, jnp.where(going_right, 3, 4))
        logits = jax.nn.one_hot(act, cfg.num_actions) * 50.0
        return logits, jnp.zeros(act.shape)

    mg = evaluate_policy(
        {}, raster_apply, cfg, ev, jax.random.PRNGKey(2),
        guide=make_guide(cfg),
    )
    mp = evaluate_policy({}, raster_apply, cfg, ev, jax.random.PRNGKey(2))
    # statistical, not structural: the guide can lose individual episodes
    # it overrides (measured at 1000 eps it wins; the in-domain mode
    # SELECTION of domain_slack flips one episode of this 32-ep sample)
    assert mg.success.mean() >= mp.success.mean() - 1.0 / ev.episodes - 1e-6


def test_ambiguity_spread_discriminates_geometry():
    """`return_ambiguity`: the multi-start mode spread is ~0 on an
    identifying geometry and large (>100 px) on a short single-axis
    contact segment — the global identifiability signal the local Schur
    theta variance cannot provide (RESULTS.md ridge-ride study)."""
    cfg = _wrf_cfg()
    gcfg = AnisoGuideConfig()
    model_n = make_model_n(cfg)
    src = jnp.array([220.0, 310.0])
    theta = 0.9
    u = jnp.array([np.cos(theta), np.sin(theta)])
    v = jnp.array([-np.sin(theta), np.cos(theta)])
    pts = [src + d * u + cw * v
           for d in (80.0, 140.0, 220.0) for cw in np.linspace(-25., 25., 9)]
    pos = jnp.stack(pts)
    c = model_n(pos, src, theta)
    w = (c >= 0.03).astype(jnp.float32)
    *_, spread_good = fit_aniso(pos, c, w, cfg, gcfg, return_ambiguity=True)
    assert float(spread_good) < 10.0
    # short contact segment ALONG the ridge: the wrong-end phantom family
    # leaves near-best modes 100+ px apart
    pos2 = jnp.stack([src + d * u for d in np.linspace(100.0, 130.0, 8)])
    c2 = model_n(pos2, src, theta)
    _, _, se2, _, spread_bad = fit_aniso(
        pos2, c2, jnp.ones((8,)), cfg, gcfg, return_ambiguity=True)
    assert float(spread_bad) > 100.0
    assert float(se2) > gcfg.max_se  # and the fit rightly does not validate


def test_ride_trigger_budget_and_default_off():
    """The ridge-ride override fires only when enabled, only on an
    unvalidated fit with samples, and respects its step budget (ships
    default-off: measured negative, RESULTS.md)."""
    cfg = _wrf_cfg()
    base = derive_aniso_config(cfg, terminate_radius=50.0, success_radius=40.0)
    model_n = make_model_n(cfg)
    src = jnp.array([220.0, 310.0])
    theta = 0.9
    u = jnp.array([np.cos(theta), np.sin(theta)])

    def walk(gcfg):
        init, step = make_aniso_guide(cfg, gcfg=gcfg)
        step = jax.jit(step)
        gs, n_ov = init, 0
        # inward walk along the ridge, deep enough that conc stays under
        # safety_conc: samples accrue but the fit cannot validate
        for d in np.linspace(230.0, 190.0, 12):
            p = src + d * u
            conc_raw = model_n(p[None], src, theta)[0] * cfg.conc_peak
            gs, _, ov = step(gs, jnp.asarray(p), conc_raw, jnp.int32(0))
            n_ov += int(ov)
        return gs, n_ov

    assert not base.ride  # default off
    gs, n_ov = walk(base)
    assert int(gs.ride_count) == 0 and n_ov == 0
    gs, n_ov = walk(dataclasses.replace(base, ride=True, ride_ambig_min=0.0))
    assert int(gs.ride_count) == n_ov > 0
    gs, n_ov = walk(dataclasses.replace(
        base, ride=True, ride_ambig_min=0.0, ride_budget=2))
    assert int(gs.ride_count) == n_ov == 2


def test_search_fallback_resumes_and_defaults_off():
    """The resuming serpentine search (AnisoGuideConfig.search_after,
    ported from the bank guide's measured-positive fallback) engages
    only after search_after consecutive contact-free steps, yields
    control on a readable read, and RESUMES when contact dries up again.
    Default 0 = off: dry flights stay under policy control."""
    cfg = _wrf_cfg(max_steps=800)
    base = derive_aniso_config(cfg, terminate_radius=50.0,
                               success_radius=40.0)
    assert base.search_after == 0  # default off
    noise_mean = cfg.turbulence_intensity * (0.7978845608 + 0.1)
    dry_pos = jnp.array([100.0, 100.0])
    readable = 0.2 * cfg.conc_peak + noise_mean  # well above conc_floor

    def run(gcfg, n_dry):
        init, step = make_aniso_guide(cfg, gcfg=gcfg)
        step = jax.jit(step)
        gs, overrides = init, []
        for _ in range(n_dry):
            gs, a, ov = step(gs, dry_pos, jnp.float32(0.0), jnp.int32(0))
            overrides.append((bool(ov), int(a)))
        return gs, step, overrides

    # default off: 40 dry steps, never overrides
    _, _, ov0 = run(base, 40)
    assert all(not o for o, _ in ov0)

    # search_after=10: policy keeps control for 10 steps, then the sweep
    # takes over with a real move (never action 0)
    gcfg = dataclasses.replace(base, search_after=10)
    gs, step, ov1 = run(gcfg, 14)
    assert all(not o for o, _ in ov1[:9])
    assert all(o and a != 0 for o, a in ov1[-4:])

    # one readable read hands control back and resets the timer ...
    gs, a, ov = step(gs, dry_pos, jnp.float32(readable), jnp.int32(0))
    assert not bool(ov)
    for _ in range(5):
        gs, a, ov = step(gs, dry_pos, jnp.float32(0.0), jnp.int32(0))
        assert not bool(ov)
    # ... and the sweep RESUMES once contact has been dry for the budget
    for _ in range(10):
        gs, a, ov = step(gs, dry_pos, jnp.float32(0.0), jnp.int32(0))
    assert bool(ov) and int(a) != 0


def test_search_sweep_covers_bands():
    """Following the sweep's own actions from a corner traverses full
    x-extents and steps through multiple y bands (boustrophedon)."""
    cfg = _wrf_cfg(max_steps=2000)
    gcfg = dataclasses.replace(
        derive_aniso_config(cfg, terminate_radius=50.0), search_after=1)
    init, step = make_aniso_guide(cfg, gcfg=gcfg)
    step = jax.jit(step)
    gs = init
    mv = cfg.grid_size * cfg.move_frac
    deltas = {1: (0.0, mv), 2: (0.0, -mv), 3: (mv, 0.0), 4: (-mv, 0.0)}
    pos = jnp.array([30.0, 30.0])
    xs, ys = [], []
    for _ in range(160):
        gs, a, ov = step(gs, pos, jnp.float32(0.0), jnp.int32(0))
        if bool(ov):
            dx, dy = deltas[int(a)]
            pos = jnp.clip(pos + jnp.array([dx, dy]), 0.0,
                           cfg.grid_size - 1.0)
        xs.append(float(pos[0])); ys.append(float(pos[1]))
    band_h = 1.12 * cfg.plume_sigma
    assert max(xs) > 0.8 * cfg.grid_size and min(xs) < 0.2 * cfg.grid_size
    assert len({int(y // band_h) for y in ys}) >= 3
