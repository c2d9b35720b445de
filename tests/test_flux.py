"""Multi-source plumes + flux inversion (reference README.md:18 goal —
<20% flux error — absent from the reference's code; SURVEY.md §6)."""

import jax
import jax.numpy as jnp
import numpy as np

from tpu_plume.core.config import EnvConfig
from tpu_plume.env import methane
from tpu_plume.evaluation.flux import (
    design_matrix,
    flux_inversion_study,
    invert_fluxes,
)
from tpu_plume.fields.analytic import (
    FieldState,
    all_sources,
    new_field,
    sample_conc_tke,
    source_strengths,
)


def _field(seed=7):
    return FieldState(
        source=jnp.array([120.0, 300.0]), seed=jnp.uint32(seed),
        wind=jnp.array([1.5, 0.5]), idx=jnp.int32(0),
    )


def test_extra_sources_deterministic_and_in_bounds():
    cfg = EnvConfig(num_sources=4)
    f = _field()
    srcs = np.asarray(all_sources(f, cfg))
    assert srcs.shape == (4, 2)
    np.testing.assert_allclose(srcs[0], [120.0, 300.0])
    assert (srcs >= cfg.source_padding).all()
    assert (srcs <= cfg.grid_size - cfg.source_padding).all()
    # pure function of the seed
    np.testing.assert_array_equal(srcs, np.asarray(all_sources(f, cfg)))
    srcs2 = np.asarray(all_sources(f.replace(seed=jnp.uint32(8)), cfg))
    assert not np.allclose(srcs[1:], srcs2[1:])

    qs = np.asarray(source_strengths(f, cfg))
    assert qs[0] == 1.0
    lo, hi = cfg.source_strength_range
    assert ((qs[1:] >= lo) & (qs[1:] <= hi)).all()


def test_multi_source_field_superposes():
    cfg1 = EnvConfig(num_sources=1, turbulence_intensity=0.0)
    cfg3 = EnvConfig(num_sources=3, turbulence_intensity=0.0)
    f = _field()
    srcs = np.asarray(all_sources(f, cfg3))
    # at a far extra source's location, the 3-source field sees signal the
    # single-source field doesn't
    ix = jnp.int32(int(srcs[2][0]))
    iy = jnp.int32(int(srcs[2][1]))
    c1, _ = sample_conc_tke(f, ix, iy, cfg1)
    c3, _ = sample_conc_tke(f, ix, iy, cfg3)
    if np.linalg.norm(srcs[2] - srcs[0]) > 6 * cfg3.plume_sigma:
        assert float(c3) > float(c1) + 10.0


def test_env_success_gates_on_nearest_source():
    cfg = EnvConfig(num_sources=3, turbulence_intensity=1e-6)
    state, _ = methane.reset(jax.random.PRNGKey(0), cfg)
    srcs = np.asarray(all_sources(state.field, cfg))
    # teleport next to extra source #1
    state = state.replace(
        pos=jnp.asarray(srcs[1], jnp.float32), radius=jnp.float32(30.0)
    )
    _, tr = methane.step_noise(state, jnp.int32(0), jnp.zeros(2, jnp.float32), cfg)
    assert bool(tr.info.reached)
    assert float(tr.info.distance) < 30.0


def test_invert_fluxes_exact_on_clean_samples():
    """Noise-free samples from the kernel model invert to the true q."""
    cfg = EnvConfig(num_sources=3, turbulence_intensity=0.0)
    f = _field(3)
    srcs = all_sources(f, cfg)
    q_true = source_strengths(f, cfg)
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(0, 499, (600, 2)), jnp.float32)
    a = design_matrix(pts, srcs, f.wind, cfg)
    concs = a @ q_true
    q = invert_fluxes(pts, concs, srcs, f.wind, cfg)
    np.testing.assert_allclose(np.asarray(q), np.asarray(q_true), rtol=1e-3)


def test_flux_study_meets_20pct_goal():
    cfg = EnvConfig(num_sources=3, max_steps=10000)
    out = flux_inversion_study(
        cfg, jax.random.PRNGKey(0), num_episodes=32, num_steps=400
    )
    assert out["observed_frac"] > 0.3
    assert out["mean_rel_error"] < 0.2, out
    assert out["within_20pct"] > 0.7, out


def test_estimate_sources_recovers_positions():
    """Clean kernel samples: the peak-pick + weighted-EM estimator lands
    within a few px of each true source."""
    from tpu_plume.evaluation.flux import estimate_sources

    cfg = EnvConfig(num_sources=3, turbulence_intensity=0.0)
    f = _field(3)
    srcs = np.asarray(all_sources(f, cfg))
    q_true = source_strengths(f, cfg)
    rng = np.random.default_rng(1)
    pts = jnp.asarray(rng.uniform(0, 499, (1500, 2)), jnp.float32)
    concs = design_matrix(pts, jnp.asarray(srcs), f.wind, cfg) @ q_true
    est = np.asarray(estimate_sources(pts, concs, 3, cfg))
    d = np.linalg.norm(est[:, None] - srcs[None, :], axis=-1)
    # each true source has an estimate within 12 px (dense clean sampling)
    assert d.min(axis=0).max() < 12.0, d


def test_flux_study_estimated_positions_end_to_end():
    """The honest pipeline (no oracle positions): joint position+strength
    error against the README <20% goal — looser than the oracle bound but
    must stay in its ballpark for observed sources."""
    cfg = EnvConfig(num_sources=3, max_steps=10000)
    out = flux_inversion_study(
        cfg, jax.random.PRNGKey(0), num_episodes=32, num_steps=400,
        estimated_positions=True,
    )
    assert out["estimated_positions"] is True
    assert out["observed_frac"] > 0.3
    assert np.isfinite(out["mean_pos_error"])
    assert out["median_pos_error"] < 20.0, out
    assert out["median_rel_error"] < 0.3, out
    # for sources the survey actually localized (pos err <= 20 px), the
    # joint pipeline meets the README <20% strength goal
    assert out["median_rel_error_localized"] < 0.15, out
    assert out["within_20pct_localized"] > 0.7, out


def test_flux_study_coverage_survey_beats_random():
    """Round-4 VERDICT #8: the coverage-designed raster survey must lift
    the localized-source fraction and the OVERALL within-20% rate well
    above the random walk (measured at full scale: localized 43% -> 88-92%,
    within-20% 64% -> 85-87%; see RESULTS.md round 4)."""
    from tpu_plume.evaluation.oracle import make_oracle

    cfg = EnvConfig(num_sources=3, max_steps=10000)
    kw = dict(num_episodes=24, num_steps=500, estimated_positions=True)
    ras = flux_inversion_study(
        cfg, jax.random.PRNGKey(0), oracle=make_oracle("raster", cfg), **kw
    )
    rnd = flux_inversion_study(cfg, jax.random.PRNGKey(0), **kw)
    assert ras["localized_frac"] >= rnd["localized_frac"] + 0.2, (ras, rnd)
    assert ras["within_20pct"] >= 0.75, ras
    assert ras["observed_frac"] >= 0.95, ras


def test_reseat_recovers_merged_pair():
    """Stage-4 residual re-seating: two sources ~1.5 sigma apart + one far —
    greedy picking with the 3-sigma suppression radius parks two candidates
    on the stronger cores and loses one; the reseat moves the duplicate to
    the unexplained residual peak."""
    from tpu_plume.evaluation.flux import estimate_sources

    cfg = EnvConfig(num_sources=3, turbulence_intensity=0.0)
    srcs = jnp.asarray([[150.0, 150.0], [150.0, 200.0], [380.0, 380.0]])
    q_true = jnp.asarray([1.0, 0.9, 1.1])
    rng = np.random.default_rng(3)
    pts = jnp.asarray(rng.uniform(0, 499, (2000, 2)), jnp.float32)
    concs = design_matrix(pts, srcs, jnp.zeros(2), cfg) @ q_true
    est0 = np.asarray(estimate_sources(pts, concs, 3, cfg, reseat_iters=0))
    est1 = np.asarray(estimate_sources(pts, concs, 3, cfg, reseat_iters=1))
    def worst(est):
        d = np.linalg.norm(est[:, None] - np.asarray(srcs)[None], axis=-1)
        return d.min(axis=0).max()
    # reseat must not be worse, and must land every source within 15 px
    assert worst(est1) <= max(worst(est0), 15.0)
    assert worst(est1) < 15.0, (est0, est1)


def test_joint_refine_resolves_close_pair_strengths():
    """Stage-5 joint LM: clean dense sampling of a close pair — positions
    AND strengths recovered within a few percent (the separable per-source
    fits double-count the shared blob)."""
    from tpu_plume.evaluation.flux import estimate_sources

    cfg = EnvConfig(num_sources=2, turbulence_intensity=0.0)
    # 1.6 sigma apart — the dup_r regime the accounting showed failing:
    # separable per-source fits read each q as ~the pair's sum here
    srcs = jnp.asarray([[220.0, 215.0], [220.0, 265.0]])
    q_true = jnp.asarray([1.2, 0.8])
    rng = np.random.default_rng(4)
    pts = jnp.asarray(rng.uniform(100, 380, (3000, 2)), jnp.float32)
    concs = design_matrix(pts, srcs, jnp.zeros(2), cfg) @ q_true
    mus, qs = estimate_sources(pts, concs, 2, cfg, return_strengths=True)
    mus, qs = np.asarray(mus), np.asarray(qs)
    order = np.argsort(mus[:, 1])
    np.testing.assert_allclose(mus[order], np.asarray(srcs), atol=6.0)
    np.testing.assert_allclose(qs[order], np.asarray(q_true), rtol=0.15)
