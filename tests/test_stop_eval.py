"""Stop-controller and evaluation-harness tests."""

import jax
import jax.numpy as jnp
import numpy as np

from tpu_plume.core.config import EnvConfig, EvalConfig, StopConfig
from tpu_plume.evaluation import (
    evaluate_policy,
    generate_expert_data,
    make_heuristic_gate,
    make_peak_stop_gate,
    make_threshold_gate,
    summarize,
)
from tpu_plume.models import ActorCritic
from tpu_plume.stop import (
    heuristic_stop_init,
    heuristic_stop_step,
    peak_stop_init,
    peak_stop_step,
    threshold_init,
    threshold_step,
)

STOP = StopConfig()
EVAL = EvalConfig(episodes=32, success_distance=40.0)
CFG = EnvConfig(max_steps=60, plume_sigma=500 / 16)


def test_threshold_controller_semantics():
    """Stop fires only after min_activate steps, with a refreshed threshold
    (reference ThresholdController, PPOV2.0/evaluate_with_lstm.py:10-37)."""
    predict = lambda w: jnp.float32(50.0)  # predicted source conc
    s = threshold_init(STOP)
    fired_at = None
    for t in range(1, 31):
        conc = jnp.float32(60.0)  # above 50*0.95 from the start
        s, stop = threshold_step(s, conc, predict, STOP)
        if bool(stop) and fired_at is None:
            fired_at = t
    # threshold first refreshed at step 20 (count%10==0 and count>=20)
    assert fired_at == 20
    np.testing.assert_allclose(float(s.threshold), 47.5)


def test_threshold_no_stop_below_threshold():
    predict = lambda w: jnp.float32(90.0)
    s = threshold_init(STOP)
    for t in range(40):
        s, stop = threshold_step(s, jnp.float32(10.0), predict, STOP)
        assert not bool(stop)


def test_peak_stop_gate():
    predict = lambda w: (jnp.float32(0.9), jnp.float32(0.95))
    s = peak_stop_init(STOP)
    fired_at = None
    for t in range(1, 25):
        s, stop = peak_stop_step(s, jnp.float32(50.0), predict, STOP)
        if bool(stop):
            fired_at = t
            break
    assert fired_at == STOP.peak_stop_window  # needs a full 20-window
    np.testing.assert_allclose(float(s.peak_pred), 0.9)


def test_heuristic_gate():
    ev = EvalConfig()
    s = heuristic_stop_init(ev)
    # stationary agent at high concentration -> fires once window full
    for t in range(1, 15):
        s, stop = heuristic_stop_step(s, jnp.array([10.0, 10.0]), jnp.float32(90.0), 100.0, ev)
        if t < ev.heuristic_position_window:
            assert not bool(stop)
    assert bool(stop)
    # moving agent never fires
    s = heuristic_stop_init(ev)
    for t in range(1, 15):
        s, stop = heuristic_stop_step(
            s, jnp.array([10.0 * t, 10.0]), jnp.float32(90.0), 100.0, ev
        )
    assert not bool(stop)


def _params():
    model = ActorCritic()
    return model, model.init(jax.random.PRNGKey(0), jnp.zeros((1, 6)))


def test_evaluate_policy_metrics_schema(tmp_path):
    model, params = _params()
    m = evaluate_policy(params, model.apply, CFG, EVAL, jax.random.PRNGKey(1))
    n = EVAL.episodes
    assert m.deviations.shape == (n,)
    assert m.steps.shape == (n,) and m.steps.max() <= CFG.max_steps
    assert m.success.dtype == bool and m.stopped_early.dtype == bool
    # no stop gate -> no early stops
    assert not m.stopped_early.any()
    s = summarize(m)
    assert set(s) == {
        "mean_deviation", "std_deviation", "success_rate",
        "success_mean_deviation", "success_std_deviation",
        "early_stop_rate", "mean_steps",
    }
    m.save_npz(str(tmp_path / "validation_metrics.npz"))
    loaded = np.load(tmp_path / "validation_metrics.npz")
    assert set(loaded.files) == {"deviations", "steps", "success", "stopped_early"}


def test_guided_npz_carries_diagnostics(tmp_path):
    """Guided runs export the guide-state diagnostics; plain runs keep the
    exact reference schema (previous test)."""
    from tpu_plume.evaluation.guidance import make_guide

    model, params = _params()
    m = evaluate_policy(params, model.apply, CFG, EVAL, jax.random.PRNGKey(1),
                        guide=make_guide(CFG))
    m.save_npz(str(tmp_path / "validation_metrics.npz"))
    loaded = np.load(tmp_path / "validation_metrics.npz")
    assert {"deviations", "steps", "success", "stopped_early",
            "guide_hover", "guide_fit_ok", "guide_samples", "guide_est",
            "guide_refutes", "guide_dmin", "guide_committed"} <= set(loaded.files)
    assert loaded["guide_est"].shape == (EVAL.episodes, 2)


def test_evaluate_with_always_stop_gate():
    """An always-fire gate must stop every episode at the window boundary."""
    model, params = _params()
    gate = make_peak_stop_gate(lambda w: (jnp.float32(1.0), jnp.float32(1.0)), STOP)
    m = evaluate_policy(params, model.apply, CFG, EVAL, jax.random.PRNGKey(1), stop_gate=gate)
    assert m.stopped_early.all()
    assert (m.steps == STOP.peak_stop_window).all()


def test_evaluate_with_threshold_gate_runs():
    model, params = _params()
    gate = make_threshold_gate(lambda w: jnp.float32(1000.0), STOP)  # unreachable
    m = evaluate_policy(params, model.apply, CFG, EVAL, jax.random.PRNGKey(2), stop_gate=gate)
    assert not m.stopped_early.any()


def test_evaluate_with_heuristic_gate_runs():
    model, params = _params()
    gate = make_heuristic_gate(EVAL, CFG.conc_peak)
    m = evaluate_policy(params, model.apply, CFG, EVAL, jax.random.PRNGKey(3), stop_gate=gate)
    assert m.deviations.shape == (EVAL.episodes,)


def test_generate_expert_data(tmp_path):
    model, params = _params()
    path = str(tmp_path / "expert_data.npz")
    states, actions = generate_expert_data(
        params, model.apply, CFG, jax.random.PRNGKey(0), num_episodes=8, path=path
    )
    assert states.ndim == 2 and states.shape[1] == 6
    assert states.shape[0] == actions.shape[0] > 0
    assert states.shape[0] <= 8 * CFG.max_steps
    from tpu_plume.data import load_expert_data

    s, a = load_expert_data(path)
    assert s.shape == states.shape


# ---- scripted oracle teachers (evaluation/oracle.py) ----

def _oracle_state(pos, src, radius=50.0, t=30):
    """Minimal duck-typed EnvState for the pure-geometry oracle tests.
    ``t`` defaults past the raster's descend-first phase (grid/move)."""
    from types import SimpleNamespace

    return SimpleNamespace(
        pos=jnp.asarray(pos, jnp.float32),
        field=SimpleNamespace(source=jnp.asarray(src, jnp.float32)),
        radius=jnp.float32(radius),
        t=jnp.int32(t),
    )


def test_oracle_phase_avoids_shallow_crossing():
    """From d=60 along +x (move 25): crossing lands at 35 (deep) -> look1
    takes it; from d=70 every crossing action lands shallow (45) -> phase
    must take a non-crossing setup step while look1 staircases into the
    shallow band."""
    from tpu_plume.evaluation import make_oracle

    cfg = EnvConfig(plume_sigma=500 / 16)
    look1 = make_oracle("look1", cfg)
    phase = make_oracle("phase", cfg)

    deep_avail = _oracle_state([200.0, 250.0], [260.0, 250.0])  # d=60: +x lands 35
    assert int(look1(deep_avail)) == 3
    assert int(phase(deep_avail)) == 3

    shallow_only = _oracle_state([190.0, 250.0], [260.0, 250.0])  # d=70: +x lands 45
    assert int(look1(shallow_only)) == 3  # staircases into (40, 50]
    a = int(phase(shallow_only))
    assert a != 3  # refuses the shallow crossing
    # and the chosen setup step must keep it outside the terminate ball
    deltas = np.array([[0, 0], [0, 25], [0, -25], [25, 0], [-25, 0]], np.float32)
    d_after = np.linalg.norm(np.array([190.0, 250.0]) + deltas[a] - [260.0, 250.0])
    assert d_after > 50.0


def test_oracle_raster_sweeps_without_source():
    """The raster surveyor is NON-privileged: it reads only pos.  It sweeps
    +x on even bands, -x on odd bands, and steps +y at row ends."""
    from tpu_plume.evaluation import make_oracle

    cfg = EnvConfig(plume_sigma=500 / 16)
    raster = make_oracle("raster", cfg)
    band = 1.12 * cfg.plume_sigma
    mid_even = _oracle_state([250.0, 0.5 * band], [999.0, 999.0])
    assert int(raster(mid_even)) == 3       # sweep right
    mid_odd = _oracle_state([250.0, 1.5 * band], [999.0, 999.0])
    assert int(raster(mid_odd)) == 4        # sweep left
    edge = _oracle_state([495.0, 0.5 * band], [999.0, 999.0])
    assert int(raster(edge)) == 1           # advance a row
    # descend-first (round 5): the first grid/move steps go straight down,
    # anchoring the serpentine at y=0 from any spawn height
    high = _oracle_state([250.0, 400.0], [999.0, 999.0], t=0)
    assert int(raster(high)) == 2


def test_oracle_phase_lands_deep_through_real_env():
    """Statistical: the phase oracle's success@40 conditional through the
    real (turbulent) env is ~85%; assert well above the ~33% chord level."""
    from tpu_plume.env import methane
    from tpu_plume.evaluation import make_oracle

    cfg = EnvConfig(max_steps=120, plume_sigma=500 / 16)
    oracle = make_oracle("phase", cfg)
    act = jax.jit(oracle)
    step_j = jax.jit(lambda s, a, k: methane.step(s, a, k, cfg))
    key = jax.random.PRNGKey(0)
    reached, deep = 0, 0
    for ep in range(24):
        key, rk = jax.random.split(key)
        state, _ = methane.reset(rk, cfg)
        for _ in range(cfg.max_steps):
            key, sk = jax.random.split(key)
            state, tr = step_j(state, act(state), sk)
            if bool(tr.done):
                if bool(tr.info.reached):
                    reached += 1
                    deep += bool(float(tr.info.distance) <= 40.0)
                break
    assert reached >= 16
    assert deep / reached >= 0.6


def test_generate_expert_data_oracle(tmp_path):
    from tpu_plume.evaluation import make_oracle

    oracle = make_oracle("phase", CFG)
    states, actions = generate_expert_data(
        None, None, CFG, jax.random.PRNGKey(1), num_episodes=8, oracle=oracle
    )
    assert states.shape[1] == CFG.obs_dim
    assert states.shape[0] == actions.shape[0] > 0
    assert 0 <= actions.min() and actions.max() < 5


def test_oracle_follows_episode_radius():
    """Dynamic teacher geometry: under a shrunken curriculum radius the
    phase oracle must NOT hover outside the protocol's 50-ball (that
    stalls the curriculum — measured round 3); with 25-unit moves and a
    tiny ball it degrades to the pure approach staircase."""
    from tpu_plume.evaluation import make_oracle

    cfg = EnvConfig(plume_sigma=500 / 16)
    phase = make_oracle("phase", cfg)

    # d=70 with episode radius 7.4: nothing crosses, nothing lands deep —
    # expect the staircase step TOWARD the source (+x), not a hover/stay.
    st = _oracle_state([190.0, 250.0], [260.0, 250.0], radius=7.4)
    assert int(phase(st)) == 3

    # same position at protocol radius 50: the crossing would be shallow
    # (45), so the phase teacher refuses +x (the round-3 unit case).
    st50 = _oracle_state([190.0, 250.0], [260.0, 250.0], radius=50.0)
    assert int(phase(st50)) != 3

    # explicit pinned geometry overrides the episode radius
    pinned = make_oracle("phase", cfg, terminate_radius=50.0)
    assert int(pinned(st)) != 3
