"""Environment parity tests.

The jitted pure-function env is checked step-for-step against a literal NumPy
oracle of the reference ``MethaneEnv.step`` (PPOV1.1/environment.py:82-168)
evaluated on the materialized analytic field, with identical turbulence
displacement draws.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_plume.core.config import EnvConfig, get_preset
from tpu_plume.env import methane
from tpu_plume.fields.analytic import materialize_fields

CFG = EnvConfig(max_steps=50, plume_sigma=500 / 16)


def _np_reference_step(cfg, conc_field, tke_field, source, pos, t, visited,
                       action, turb_randn, radius, explore_bonus):
    """Literal NumPy mirror of the reference step()."""
    g = cfg.grid_size
    move_step = g * cfg.move_frac
    tke_norm = cfg.turbulence_intensity * 3.0
    t += 1

    px = int(np.clip(int(pos[0]), 0, g - 1))
    py = int(np.clip(int(pos[1]), 0, g - 1))
    prev_conc = conc_field[px, py] / cfg.conc_peak

    dx, dy = [(0, 0), (0, move_step), (0, -move_step),
              (move_step, 0), (-move_step, 0)][action]
    move_magnitude = np.linalg.norm([dx, dy]) / move_step
    move_penalty = -0.15 * (1 - move_magnitude)

    turb = move_step * 0.2 * turb_randn * tke_field[px, py] / tke_norm
    new_pos = np.clip(pos + np.array([dx, dy]) + turb, 0, g - cfg.clip_edge_eps)

    cx = int(np.clip(int(new_pos[0]), 0, g - 1))
    cy = int(np.clip(int(new_pos[1]), 0, g - 1))
    cur_conc = conc_field[cx, cy] / cfg.conc_peak
    grad = (cur_conc - prev_conc) / (np.linalg.norm([dx, dy]) + 1e-6)
    bdist = min(new_pos[0] / g, (g - new_pos[0]) / g,
                new_pos[1] / g, (g - new_pos[1]) / g)
    if bdist < cfg.boundary_decay_start and grad < -0.01:
        boundary_penalty = -cfg.boundary_penalty * (cfg.boundary_decay_start - bdist) ** 2
    else:
        boundary_penalty = 0.0

    gx, gy = int(new_pos[0] // cfg.cell_size), int(new_pos[1] // cfg.cell_size)
    visited[(gx, gy)] = visited.get((gx, gy), 0) + 1
    visits = visited[(gx, gy)]
    explore_level = min(visits / 5.0, 1.0)
    explore_reward = explore_bonus * (1 - explore_level) / (visits ** 0.75 + 1)

    tke_n = tke_field[cx, cy] / tke_norm
    total = (cfg.conc_reward_coef * cur_conc + explore_reward + move_penalty
             - cfg.tke_penalty_factor * tke_n + boundary_penalty)
    dist = np.linalg.norm(new_pos - source)
    reached = dist <= radius
    if reached:
        total += min(500, 150 * (cfg.initial_radius / radius))
    done = t >= cfg.max_steps or reached
    obs = np.array([new_pos[0] / g, new_pos[1] / g, cur_conc, tke_n,
                    t / cfg.max_steps, explore_level], np.float32)
    return new_pos, t, obs, total, done


def test_step_matches_numpy_oracle():
    key = jax.random.PRNGKey(0)
    state, obs = methane.reset(key, CFG)
    conc_field, tke_field = map(np.asarray, materialize_fields(state.field, CFG))
    source = np.asarray(state.field.source)

    step_fn = jax.jit(methane.step, static_argnames="cfg")
    rng = np.random.RandomState(1)
    pos, t, visited = np.zeros(2), 0, {}
    for i in range(40):
        action = int(rng.randint(5))
        key, sub = jax.random.split(key)
        turb_randn = np.asarray(jax.random.normal(sub, (2,), jnp.float32))
        state, trans = step_fn(state, jnp.int32(action), sub, CFG)
        pos, t, ref_obs, ref_reward, ref_done = _np_reference_step(
            CFG, conc_field, tke_field, source, pos, t, visited,
            action, turb_randn, CFG.initial_radius, CFG.explore_bonus_init)
        np.testing.assert_allclose(np.asarray(trans.obs), ref_obs, rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(float(trans.reward), ref_reward, rtol=2e-5, atol=2e-5)
        assert bool(trans.done) == ref_done
        np.testing.assert_allclose(np.asarray(state.pos), pos, rtol=1e-5, atol=1e-4)
        if ref_done:
            break


def test_reset_contract():
    state, obs = methane.reset(jax.random.PRNGKey(3), CFG)
    assert obs.shape == (6,)
    # agent at origin; source within padding box
    assert np.allclose(np.asarray(state.pos), 0.0)
    src = np.asarray(state.field.source)
    assert np.all(src >= CFG.source_padding) and np.all(src <= CFG.grid_size - CFG.source_padding)
    # t=0, no visits yet -> explore_level 0
    assert float(obs[4]) == 0.0 and float(obs[5]) == 0.0


def test_reward_decomposition_sums():
    key = jax.random.PRNGKey(7)
    state, _ = methane.reset(key, CFG)
    for i in range(10):
        key, sub = jax.random.split(key)
        state, tr = methane.step(state, jnp.int32(i % 5), sub, CFG)
        parts = (tr.info.concentration_reward + tr.info.explore_reward +
                 tr.info.move_penalty + tr.info.tke_penalty + tr.info.boundary_penalty)
        bonus = np.where(bool(tr.info.reached),
                         min(500.0, 150.0 * CFG.initial_radius / float(state.radius)), 0.0)
        np.testing.assert_allclose(float(tr.reward), float(parts) + bonus, rtol=1e-5, atol=1e-5)


def test_vmap_and_auto_reset():
    n = 16
    cfg = EnvConfig(max_steps=5, plume_sigma=500 / 16)
    keys = jax.random.split(jax.random.PRNGKey(0), n)
    reset_v = jax.vmap(lambda k: methane.reset(k, cfg))
    states, obs = reset_v(keys)
    assert obs.shape == (n, 6)

    def one(state, key):
        a_key, s_key, r_key = jax.random.split(key, 3)
        action = jax.random.randint(a_key, (), 0, 5)
        state, tr = methane.step(state, action, s_key, cfg)
        state, next_obs = methane.auto_reset(state, tr.obs, tr.done, r_key, cfg)
        return state, tr, next_obs

    step_v = jax.jit(jax.vmap(one))
    for i in range(7):
        keys = jax.random.split(jax.random.PRNGKey(100 + i), n)
        states, tr, obs = step_v(states, keys)
    # after 5+ steps every env must have auto-reset at least once -> t < max_steps
    assert np.all(np.asarray(states.t) < cfg.max_steps)
    # envs that just reset have pos at origin and obs matching a fresh reset
    done = np.asarray(tr.done)
    if done.any():
        idx = int(np.argmax(done))
        assert np.allclose(np.asarray(states.pos)[idx], 0.0)


def test_elastic_walls_v1_0():
    cfg = get_preset("ppo_v1_0").env
    key = jax.random.PRNGKey(0)
    state, _ = methane.reset(key, cfg)
    # force agent near the wall and push outward repeatedly
    state = state.replace(pos=jnp.array([1.0, 250.0], jnp.float32))
    for i in range(5):
        key, sub = jax.random.split(key)
        state, tr = methane.step(state, jnp.int32(4), sub, cfg)  # -x
        p = np.asarray(state.pos)
        assert 0.0 <= p[0] <= cfg.grid_size and 0.0 <= p[1] <= cfg.grid_size


def test_field_statistics():
    """Field matches the reference formula statistics: clip bounds, peak at
    the source, turbulence magnitude."""
    cfg = CFG
    state, _ = methane.reset(jax.random.PRNGKey(11), cfg)
    conc, tke = map(np.asarray, materialize_fields(state.field, cfg))
    assert conc.min() >= 0.0 and conc.max() <= cfg.conc_peak
    sx, sy = np.asarray(state.field.source)
    assert conc[int(sx), int(sy)] > 0.9 * cfg.conc_peak
    # turbulence mean: TI * (E|N| + 0.2*0.5) ~ 3*(0.798+0.1) = 2.69 (wave term
    # averages ~0 over the grid)
    assert abs(tke.mean() - cfg.turbulence_intensity * (np.sqrt(2 / np.pi) + 0.1)) < 0.1


def test_v1_0_reward_variant():
    """V1.0 reward form (PPOV1.0/ppo0.0.py:158-187): flat move penalty,
    bonus/(visits+1) exploration, flat boundary penalty, uncapped terminal."""
    cfg = get_preset("ppo_v1_0").env
    import dataclasses
    cfg = dataclasses.replace(cfg, max_steps=50)
    key = jax.random.PRNGKey(0)
    state, obs = methane.reset(key, cfg)
    conc_field, tke_field = map(np.asarray, materialize_fields(state.field, cfg))
    g = cfg.grid_size

    for i in range(20):
        key, sub = jax.random.split(key)
        turb_randn = np.asarray(jax.random.normal(sub, (2,), jnp.float32))
        pos_before = np.asarray(state.pos)
        visited_before = np.asarray(state.visited)
        state, tr = methane.step(state, jnp.int32(i % 5), sub, cfg)
        pos = np.asarray(state.pos)
        # oracle
        cx, cy = int(min(max(pos[0], 0), g - 1)), int(min(max(pos[1], 0), g - 1))
        conc_n = conc_field[cx, cy] / cfg.conc_peak
        tke_n = tke_field[cx, cy] / (cfg.turbulence_intensity * 3)
        gx, gy = min(int(pos[0] // 50), 9), min(int(pos[1] // 50), 9)
        visits = visited_before[gx, gy] + 1
        explore = cfg.explore_bonus_init / (visits + 1)
        expect = 3.0 * conc_n - 0.3 * tke_n - 0.05 + explore
        border = min(pos[0], g - pos[0], pos[1], g - pos[1])
        if border < 0.1 * g:
            expect -= 0.5
        dist = np.linalg.norm(pos - np.asarray(state.field.source))
        if dist <= cfg.initial_radius:
            expect += 100.0 * 1.0  # R0/R = 1 at initial radius
        np.testing.assert_allclose(float(tr.reward), expect, rtol=1e-4, atol=1e-4)
        if bool(tr.done):
            break


def test_terminal_depth_bonus():
    """terminal_depth_coef adds (radius - distance)/radius * coef at the
    reached step (off by default — reference parity)."""
    import dataclasses

    base = EnvConfig(turbulence_intensity=1e-6)
    deep = dataclasses.replace(base, terminal_depth_coef=100.0)
    state, _ = methane.reset(jax.random.PRNGKey(0), base)
    src = state.field.source
    # place the agent 10 units from the source with radius 50 -> depth 0.8
    pos = src + jnp.array([10.0, 0.0])
    state = state.replace(pos=pos, radius=jnp.float32(50.0))
    zero = jnp.zeros(2, jnp.float32)
    _, tr_base = methane.step_noise(state, jnp.int32(0), zero, base)
    _, tr_deep = methane.step_noise(state, jnp.int32(0), zero, deep)
    assert bool(tr_base.info.reached) and bool(tr_deep.info.reached)
    d = float(tr_deep.info.distance)
    expect = 100.0 * (50.0 - d) / 50.0
    np.testing.assert_allclose(
        float(tr_deep.reward - tr_base.reward), expect, rtol=1e-4
    )

    # terminal_depth_power sharpens the bonus: coef * depth**p.
    deep2 = dataclasses.replace(deep, terminal_depth_power=2.0)
    _, tr_deep2 = methane.step_noise(state, jnp.int32(0), zero, deep2)
    expect2 = 100.0 * ((50.0 - d) / 50.0) ** 2
    np.testing.assert_allclose(
        float(tr_deep2.reward - tr_base.reward), expect2, rtol=1e-4
    )


def test_terminal_gate_radius():
    """terminal_gate_radius zeroes the WHOLE terminal bonus for crossings
    shallower than the gate (the eval metric: success = dev <= 40 at the
    first radius-50 crossing) and leaves deep crossings untouched."""
    import dataclasses

    base = EnvConfig(turbulence_intensity=1e-6)
    gated = dataclasses.replace(base, terminal_gate_radius=40.0)
    state, _ = methane.reset(jax.random.PRNGKey(0), base)
    src = state.field.source
    zero = jnp.zeros(2, jnp.float32)

    # Deep crossing (10 units out): gate passes -> identical reward.
    deep_state = state.replace(
        pos=src + jnp.array([10.0, 0.0]), radius=jnp.float32(50.0)
    )
    _, tr_b = methane.step_noise(deep_state, jnp.int32(0), zero, base)
    _, tr_g = methane.step_noise(deep_state, jnp.int32(0), zero, gated)
    assert bool(tr_g.info.reached)
    np.testing.assert_allclose(float(tr_g.reward), float(tr_b.reward), rtol=1e-5)

    # Shallow graze (45 units out, inside radius 50 but outside the gate):
    # reached and done, but the terminal bonus is withheld.
    graze_state = state.replace(
        pos=src + jnp.array([45.0, 0.0]), radius=jnp.float32(50.0)
    )
    _, tr_bs = methane.step_noise(graze_state, jnp.int32(0), zero, base)
    _, tr_gs = methane.step_noise(graze_state, jnp.int32(0), zero, gated)
    assert bool(tr_gs.info.reached) and bool(tr_gs.done)
    withheld = float(tr_bs.reward - tr_gs.reward)
    # base terminal bonus at radius 50 = coef * initial/radius = 150
    np.testing.assert_allclose(withheld, 150.0, rtol=1e-4)


def test_obs_memory_extension():
    """obs_memory appends [dconc/peak, one-hot(prev action)]: dim 6+1+5,
    delta equals the conc change caused by the move, prev-action one-hot
    matches the action taken.  Off by default (reference parity: obs_dim 6)."""
    import dataclasses

    base = EnvConfig(max_steps=50)
    mem = dataclasses.replace(base, obs_memory=True)
    assert base.obs_dim == 6 and mem.obs_dim == 12

    state, obs0 = methane.reset(jax.random.PRNGKey(3), mem)
    assert obs0.shape == (12,)
    # at reset: prev_conc == conc (delta 0) and prev_action == 0 (stay)
    np.testing.assert_allclose(float(obs0[6]), 0.0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(obs0[7:]), [1, 0, 0, 0, 0], atol=1e-7)

    conc_before = float(state.conc)
    zero = jnp.zeros(2, jnp.float32)
    new_state, tr = methane.step_noise(state, jnp.int32(3), zero, mem)
    conc_after = float(new_state.conc)
    np.testing.assert_allclose(
        float(tr.obs[6]), (conc_after - conc_before) / mem.conc_peak, rtol=1e-5
    )
    np.testing.assert_allclose(np.asarray(tr.obs[7:]), [0, 0, 0, 1, 0], atol=1e-7)

    # auto-reset clears the memory fields
    fresh, fresh_obs = methane.auto_reset(
        new_state, tr.obs, jnp.bool_(True), jax.random.PRNGKey(4), mem
    )
    assert int(fresh.prev_action) == 0
    np.testing.assert_allclose(float(fresh_obs[6]), 0.0, atol=1e-7)


def test_obs_memory_train_smoke(tmp_path):
    """CLI wiring: --obs-memory trains and evals end-to-end (obs_dim 12)."""
    import json
    import os

    from tpu_plume.cli.main import main
    import contextlib, io

    out_dir = str(tmp_path / "mem_run")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        main([
            "train", "--preset", "ppo_v2_0", "--out", out_dir, "--obs-memory",
            "--envs", "8", "--unroll", "16", "--minibatch", "64",
            "--iterations", "2", "--episodes", "100000",
        ])
        main([
            "eval", "--preset", "ppo_v2_0", "--obs-memory",
            "--ckpt", os.path.join(out_dir, "checkpoint"), "--episodes", "4",
        ])
    lines = [l for l in buf.getvalue().splitlines() if l.startswith("{")]
    assert "mean_deviation" in json.loads(lines[-1])


def test_delta_reward_variant():
    """reward_variant='delta' (the reference README's R = dCH4 - 0.2|dtheta|
    spec, README.md:97-99, absent from all reference code): conc term equals
    coef*(conc'-conc)/peak and a heading-change penalty (1-cos)/2 lands in
    the move component."""
    import dataclasses

    base = EnvConfig(turbulence_intensity=1e-6)
    delta = dataclasses.replace(base, reward_variant="delta")
    state, _ = methane.reset(jax.random.PRNGKey(0), delta)
    # give the agent a previous heading of +x (action 3)
    state = state.replace(prev_action=jnp.int32(3),
                          pos=jnp.array([200.0, 200.0]),
                          radius=jnp.float32(1.0))
    # refresh cached conc at the new position
    from tpu_plume.fields.analytic import sample_conc_tke
    ix = jnp.int32(200); iy = jnp.int32(200)
    c0, t0 = sample_conc_tke(state.field, ix, iy, delta, None)
    state = state.replace(conc=c0, tke=t0)
    zero = jnp.zeros(2, jnp.float32)

    # same-direction move: no turn penalty; conc term is the change
    new_state, tr = methane.step_noise(state, jnp.int32(3), zero, delta)
    expect_conc = delta.conc_reward_coef * float(new_state.conc - c0) / delta.conc_peak
    np.testing.assert_allclose(
        float(tr.info.concentration_reward), expect_conc, rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(float(tr.info.move_penalty), 0.0, atol=1e-6)

    # reversal (-x, action 4): cos=-1 -> full 0.2 turn penalty
    _, tr_rev = methane.step_noise(state, jnp.int32(4), zero, delta)
    np.testing.assert_allclose(
        float(tr_rev.info.move_penalty), -delta.readme_turn_penalty, atol=1e-6
    )

    # 90-degree turn (+y, action 1): cos=0 -> half penalty
    _, tr_turn = methane.step_noise(state, jnp.int32(1), zero, delta)
    np.testing.assert_allclose(
        float(tr_turn.info.move_penalty), -delta.readme_turn_penalty / 2, atol=1e-6
    )


def test_inplume_bonus():
    """inplume_bonus pays exactly the bonus per step while conc/peak is
    above the floor, under the delta reward (off by default — parity)."""
    import dataclasses

    base = EnvConfig(
        turbulence_intensity=1e-6, reward_variant="delta",
    )
    shaped = dataclasses.replace(base, inplume_bonus=0.25)
    state, _ = methane.reset(jax.random.PRNGKey(0), base)
    src = state.field.source
    zero = jnp.zeros(2, jnp.float32)
    # deep in the plume (conc ~ peak): bonus paid
    state_in = state.replace(pos=src + jnp.array([60.0, 0.0]),
                             radius=jnp.float32(50.0))
    _, tr_b = methane.step_noise(state_in, jnp.int32(0), zero, base)
    _, tr_s = methane.step_noise(state_in, jnp.int32(0), zero, shaped)
    np.testing.assert_allclose(float(tr_s.reward - tr_b.reward), 0.25,
                               rtol=1e-5)
    # far field (conc ~ 0): no bonus
    far = jnp.where(src < 250.0, src + 200.0, src - 200.0)
    state_out = state.replace(pos=far, radius=jnp.float32(50.0))
    _, tr_b2 = methane.step_noise(state_out, jnp.int32(0), zero, base)
    _, tr_s2 = methane.step_noise(state_out, jnp.int32(0), zero, shaped)
    np.testing.assert_allclose(float(tr_s2.reward), float(tr_b2.reward),
                               rtol=1e-6)
