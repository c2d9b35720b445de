"""3-D flight tests: vertical actions, clipping, wind advection, obs layout,
horizontal success gate, and end-to-end 3-D gridded training.

New capability vs the reference (strictly 2-D, SURVEY.md §2.2); semantics
documented in docs/PARITY.md and core/config.py EnvConfig.
"""

import jax
import jax.numpy as jnp
import numpy as np

from tpu_plume.core.config import EnvConfig, get_preset
from tpu_plume.env import methane


def _cfg3d(**kw):
    base = dict(
        env_3d=True, plume_model="anisotropic", wind_speed_range=(1.0, 2.0),
        source_z=20.0, max_steps=50,
    )
    base.update(kw)
    return EnvConfig(**base)


def test_env3d_shapes_and_obs_layout():
    cfg = _cfg3d()
    assert cfg.pos_dim == 3 and cfg.obs_dim == 7 and cfg.num_actions == 7
    state, obs = methane.reset(jax.random.PRNGKey(0), cfg)
    assert state.pos.shape == (3,)
    assert obs.shape == (7,)
    # layout: [x/G, y/G, z/H, conc, tke, t, explore]
    np.testing.assert_allclose(float(obs[2]), float(state.pos[2]) / cfg.domain_height)


def test_env3d_vertical_actions_move_only_z():
    cfg = _cfg3d()
    state, _ = methane.reset(jax.random.PRNGKey(0), cfg)
    zero_noise = jnp.zeros(3, jnp.float32)
    # action 5 = +z, 6 = -z
    s_up, _ = methane.step_noise(state, jnp.int32(5), zero_noise, cfg)
    np.testing.assert_allclose(np.asarray(s_up.pos[:2]), np.asarray(state.pos[:2]))
    np.testing.assert_allclose(
        float(s_up.pos[2]), float(state.pos[2]) + cfg.z_move_step
    )
    s_dn, _ = methane.step_noise(s_up, jnp.int32(6), zero_noise, cfg)
    np.testing.assert_allclose(float(s_dn.pos[2]), float(state.pos[2]), atol=1e-5)
    # z clips at the floor (start is z=0, going down stays at 0)
    s_floor, _ = methane.step_noise(state, jnp.int32(6), zero_noise, cfg)
    assert float(s_floor.pos[2]) == 0.0


def test_env3d_z_ceiling_clip():
    cfg = _cfg3d(domain_height=12.0)  # one +z step (10.0) then clip
    state, _ = methane.reset(jax.random.PRNGKey(0), cfg)
    zero_noise = jnp.zeros(3, jnp.float32)
    for _ in range(3):
        state, _ = methane.step_noise(state, jnp.int32(5), zero_noise, cfg)
    assert float(state.pos[2]) == 12.0


def test_env3d_success_gate_is_horizontal():
    cfg = _cfg3d()
    state, _ = methane.reset(jax.random.PRNGKey(0), cfg)
    # teleport the agent right above the source, far up
    src = state.field.source
    state = state.replace(
        pos=jnp.array([src[0], src[1], 70.0]), radius=jnp.float32(50.0)
    )
    _, tr = methane.step_noise(state, jnp.int32(0), jnp.zeros(3, jnp.float32), cfg)
    assert bool(tr.info.reached)          # horizontal distance ~0
    assert float(tr.info.distance) < 10.0


def test_env3d_conc_peaks_at_source_height():
    cfg = _cfg3d()
    state, _ = methane.reset(jax.random.PRNGKey(0), cfg)
    src = state.field.source
    zero = jnp.zeros(3, jnp.float32)

    def conc_at_z(z):
        s = state.replace(pos=jnp.array([src[0], src[1], z]))
        _, tr = methane.step_noise(s, jnp.int32(0), zero, cfg)
        return float(tr.info.conc_raw)

    assert conc_at_z(cfg.source_z) > conc_at_z(cfg.source_z + 30.0)


def test_wind_advection_displaces_agent():
    cfg = _cfg3d(wind_advect_coef=1.0, wind_speed_range=(2.0, 2.0),
                 turbulence_intensity=1e-6)
    state, _ = methane.reset(jax.random.PRNGKey(3), cfg)
    state = state.replace(pos=jnp.array([250.0, 250.0, 5.0]))
    new_state, _ = methane.step_noise(
        state, jnp.int32(0), jnp.zeros(3, jnp.float32), cfg
    )
    drift = np.asarray(new_state.pos[:2]) - np.asarray(state.pos[:2])
    np.testing.assert_allclose(drift, np.asarray(state.field.wind), atol=1e-3)
    assert float(new_state.pos[2]) == 5.0  # advection is horizontal


def test_env3d_gridded_train_step():
    """One fused PPO train step over a 3-D time-varying bank compiles and
    produces finite loss (the wrf_les_3d slice, tiny shapes)."""
    from tpu_plume.fields.gridded import synthesize_3d_bank
    from tpu_plume.rl.curriculum import curriculum_init
    from tpu_plume.rollout import init_rollout
    from tpu_plume.train.ppo_trainer import (
        LoopCarry,
        build_train_step,
        make_train_state,
    )

    import dataclasses

    cfg = get_preset("wrf_les_3d")
    cfg = cfg.replace(
        env=dataclasses.replace(cfg.env, max_steps=16, grid_size=64, source_padding=10.0),
        rollout=dataclasses.replace(cfg.rollout, num_envs=8, unroll_length=8),
        ppo=dataclasses.replace(cfg.ppo, minibatch_size=32, epochs=2),
    )
    bank = synthesize_3d_bank(
        jax.random.PRNGKey(0), cfg.env, num_fields=2, num_frames=3,
        num_levels=4, grid=64, steps_per_frame=8.0,
    )
    key = jax.random.PRNGKey(1)
    loop = LoopCarry(
        train_state=make_train_state(cfg, key),
        rollout=init_rollout(key, cfg.env, 8, radius=50.0, explore_bonus=0.6, bank=bank),
        curriculum=curriculum_init(cfg.curriculum, cfg.env.explore_bonus_init),
        key=key,
    )
    step = build_train_step(cfg, bank=bank)
    loop, stats, traj = step(loop)
    assert np.isfinite(float(stats["loss/total"]))
    assert traj.obs.shape == (8, 8, 7)
    assert int(jnp.max(traj.action)) <= 6
