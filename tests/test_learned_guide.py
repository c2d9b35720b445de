"""Learned in-scan guidance tests (evaluation/learned_guide.py).

Reference pattern being matched: PPOV2.1/evaluate_with_lstm.py:73-81 (an
LSTM consulted on a trailing flight window inside the eval loop) with the
V2.1 ``GaussianParamPredictor`` zoo head (PPOV2.1/model.py:308-322) as the
estimator — the combination the reference sketched but never wired.
"""

from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np

from tpu_plume.core.config import EnvConfig, EvalConfig
from tpu_plume.evaluation.learned_guide import (
    derive_learned_guide_config,
    load_localizer_meta,
    make_learned_guide,
)


def _fixed_model(est_norm):
    """A stand-in localizer that always outputs ``est_norm`` (normalized)."""
    def apply(params, x, lengths=None):
        b = x.shape[0]
        return jnp.broadcast_to(
            jnp.array([est_norm[0], est_norm[1], 0.1, 0.8], jnp.float32),
            (b, 4),
        )
    return SimpleNamespace(apply=apply)


def test_window_fills_chronologically_then_shifts():
    cfg = EnvConfig()
    gs, step = make_learned_guide(
        cfg, {}, model=_fixed_model((0.5, 0.5)), window=4, min_window=2,
    )
    act = jnp.int32(0)
    for i in range(6):
        pos = jnp.array([float(i), 100.0 + i], jnp.float32)
        gs, _, _ = step(gs, pos, jnp.float32(10.0 + i), act)
    # after 6 samples into a 4-window: chronological tail [2, 3, 4, 5]
    xs = np.asarray(gs.window[:, 0]) * cfg.grid_size
    np.testing.assert_allclose(xs, [2.0, 3.0, 4.0, 5.0], atol=1e-4)
    assert int(gs.count) == 6


def test_stability_gate_opens_and_overrides():
    """A constant estimator passes the stability check as soon as two
    checkpointed estimates agree; the action then comes from the phase
    controller, not the policy."""
    cfg = EnvConfig()
    est = (250.0, 250.0)
    gs, step = make_learned_guide(
        cfg, {}, model=_fixed_model((est[0] / 500, est[1] / 500)),
        window=8, min_window=4, check_every=4, stable_tol=6.0,
    )
    pos = jnp.array([250.0, 150.0], jnp.float32)  # d=100 from est
    policy_action = jnp.int32(0)  # "stay" — the controller would never pick it
    actions, overrides = [], []
    for _ in range(12):
        gs, a, ov = step(gs, pos, jnp.float32(5.0), policy_action)
        actions.append(int(a))
        overrides.append(bool(ov))
    assert not overrides[0]            # gate needs two checks to open
    assert overrides[-1]               # ...then stays open
    assert actions[-1] != 0            # controller steers (policy said stay)
    assert bool(gs.est_ok) and int(gs.mode) == 1
    np.testing.assert_allclose(np.asarray(gs.est), est, atol=1e-3)


def test_unstable_estimates_defer_to_policy():
    """An estimator whose output keeps moving must never open the gate."""
    cfg = EnvConfig()
    calls = {"n": 0}

    def apply(params, x, lengths=None):
        # drift the estimate 20 px per call — beyond stable_tol
        calls["n"] += 1
        v = 0.2 + 0.04 * calls["n"]
        return jnp.broadcast_to(
            jnp.array([v, v, 0.1, 0.8], jnp.float32), (x.shape[0], 4)
        )

    gs, step = make_learned_guide(
        cfg, {}, model=SimpleNamespace(apply=apply),
        window=8, min_window=4, check_every=4, stable_tol=6.0,
    )
    pos = jnp.array([250.0, 150.0], jnp.float32)
    for _ in range(16):
        gs, a, ov = step(gs, pos, jnp.float32(5.0), jnp.int32(0))
        assert not bool(ov)
        assert int(a) == 0


def test_derive_gate_reproduces_hand_tuned_operating_points():
    """The gate derivation (0.6x median val error, clamped [4, 32]) must
    land on the three operating points the round-3 quality tables were
    hand-tuned to: tol~6 at ~10 px (iso), ~12 at ~19 px (wrf), ~24 at
    ~31 px (gridded K=16) — plus the clamps."""
    assert derive_learned_guide_config(10.0)["stable_tol"] == 6.0
    assert abs(derive_learned_guide_config(19.0)["stable_tol"] - 11.4) < 1e-6
    assert abs(derive_learned_guide_config(31.0)["stable_tol"] - 18.6) < 1e-6
    assert derive_learned_guide_config(2.0)["stable_tol"] == 4.0   # floor
    assert derive_learned_guide_config(90.0)["stable_tol"] == 32.0  # ceiling
    d = derive_learned_guide_config(10.0, window=64)
    assert d["check_every"] == 4 and d["min_window"] == 8
    d32 = derive_learned_guide_config(10.0, window=32)
    assert d32["check_every"] == 2 and d32["min_window"] == 8


def test_localizer_meta_roundtrip(tmp_path):
    """train_source_lstm persists localizer_meta.npz next to the
    checkpoint; load_localizer_meta finds it from both the run dir and
    the checkpoint subdir, and returns None for runs predating it."""
    import os

    out = tmp_path / "loc"
    os.makedirs(out)
    np.savez(out / "localizer_meta.npz", val_mean_err_px=12.5,
             val_median_err_px=10.0, window=64, grid_size=500.0,
             conc_peak=100.0)
    for probe in (str(out), str(out / "gaussian_params")):
        meta = load_localizer_meta(probe)
        assert meta is not None and meta["val_median_err_px"] == 10.0
        assert meta["window"] == 64
    assert load_localizer_meta(str(tmp_path / "nowhere")) is None


def test_learned_guided_eval_end_to_end_anisotropic():
    """Full loop on the ANISOTROPIC field (where the trilateration guide
    refuses): train the localizer on scripted-surveyor flights, then eval
    with --guide learned semantics and check the gate opens and landings
    beat the unguided chord distribution."""
    from tpu_plume.evaluation import evaluate_policy
    from tpu_plume.evaluation.guidance import make_guide
    import pytest

    cfg = EnvConfig(max_steps=400, plume_model="anisotropic")
    # anisotropic now has a closed-form route too (aniso_fit); the field
    # with NO analytic model — gridded — still requires the learned guide
    with pytest.raises(ValueError):
        make_guide(EnvConfig(plume_model="gridded"))

    # scripted east-sweep surveyor (same trick as test_guidance)
    def apply_fn(params, obs):
        t = obs[..., 4] * cfg.max_steps
        row = (t // 20).astype(jnp.int32) % 2
        logits = jax.nn.one_hot(jnp.where(row == 0, 3, 1), 5) * 50.0
        return logits, jnp.zeros(obs.shape[:-1])

    ev = EvalConfig(episodes=32, success_distance=40.0)
    m0 = evaluate_policy({}, apply_fn, cfg, ev, jax.random.PRNGKey(0),
                         track_trajectories=32)

    # train a quick localizer on these flights
    import tempfile, os
    from tpu_plume.train.lstm_trainer import train_source_lstm

    with tempfile.TemporaryDirectory() as td:
        fp = os.path.join(td, "flights.npz")
        np.savez_compressed(fp, trajectories=m0.trajectories, sources=m0.sources)
        res = train_source_lstm(None, os.path.join(td, "loc"),
                                flights_path=fp, window=32, epochs=60,
                                lr=3e-3, seed=0)
        meta = load_localizer_meta(os.path.join(td, "loc"))
        assert meta is not None and meta["window"] == 32
        assert meta["val_median_err_px"] == res.extra["val_median_err_px"]
        guide = make_learned_guide(
            cfg, res.params, window=32, min_window=12, check_every=4,
            stable_tol=25.0,
        )
        mg = evaluate_policy({}, apply_fn, cfg, ev, jax.random.PRNGKey(1),
                             guide=guide)
    # the gate opened for a meaningful share of episodes
    assert np.asarray(mg.guide_fit_ok).mean() > 0.2
