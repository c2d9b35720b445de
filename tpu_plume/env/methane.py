"""MethaneEnv as pure JAX functions.

A TPU-native re-design of the reference's ``MethaneEnv(gym.Env)``
(PPOV1.1/environment.py:18-168, PPOV2.1/environment.py:19-178,
PPOV1.0/ppo0.0.py:64-198).  Instead of a stateful object stepped from Python,
the environment is a pair of pure functions

    reset(key, cfg, radius, explore_bonus)      -> (EnvState, obs)
    step(state, action, key, cfg)               -> (EnvState, Transition)

that ``jax.vmap`` over thousands of parallel envs and run inside a jitted
``lax.scan`` rollout fused with policy inference.  All reference semantics are
preserved at the per-step level, including the shaped-reward decomposition
exposed through the ``info`` dict (environment.py:161-167) — here a
``RewardInfo`` struct.

Observation layout (environment.py:64-80), all nominally in [0, 1]:
    [x/G, y/G, conc/peak, tke/(3*TI), t/max_steps, explore_level]
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from tpu_plume.core.config import EnvConfig
from tpu_plume.fields.analytic import FieldState, new_field, sample_conc_tke


@struct.dataclass
class EnvState:
    pos: jnp.ndarray           # f32[2] agent position
    t: jnp.ndarray             # i32 step count within episode
    visited: jnp.ndarray       # i32[D, D] per-cell visit counts
    field: FieldState          # per-episode plume
    radius: jnp.ndarray        # f32 curriculum success radius
    explore_bonus: jnp.ndarray # f32 curriculum exploration bonus
    # Cached field sample at the agent's current cell.  The hash-procedural
    # field is deterministic, so caching is exact and saves re-sampling the
    # old cell every step (the reference re-reads its arrays three times per
    # step: environment.py:88, 111, obs:76-77).
    conc: jnp.ndarray          # f32 concentration at the current cell
    tke: jnp.ndarray           # f32 TKE at the current cell
    # One-step memory for the obs_memory extension (zeros when off):
    # concentration before the last move and the last action taken.
    prev_conc: jnp.ndarray     # f32
    prev_action: jnp.ndarray   # i32


@struct.dataclass
class RewardInfo:
    """Per-step reward decomposition (reference info dict,
    PPOV1.1/environment.py:161-167) plus terminal diagnostics."""

    concentration_reward: jnp.ndarray
    explore_reward: jnp.ndarray
    move_penalty: jnp.ndarray
    tke_penalty: jnp.ndarray
    boundary_penalty: jnp.ndarray
    reached: jnp.ndarray       # bool: within curriculum radius this step
    distance: jnp.ndarray      # f32 distance to source after the move
    conc_raw: jnp.ndarray      # unnormalized concentration at the new cell


@struct.dataclass
class Transition:
    obs: jnp.ndarray           # f32[6] observation after the step
    reward: jnp.ndarray        # f32 total shaped reward
    done: jnp.ndarray          # bool: reached or max_steps
    info: RewardInfo


def _cell(pos: jnp.ndarray, cfg: EnvConfig):
    """Integer grid cell for a float position (reference:
    ``np.clip(int(pos), 0, grid-1)``; positions are >= 0 so trunc == floor)."""
    ij = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, cfg.grid_size - 1)
    return ij[0], ij[1]


def _explore_cell(pos: jnp.ndarray, cfg: EnvConfig):
    c = jnp.clip(
        jnp.floor(pos / cfg.cell_size).astype(jnp.int32), 0, cfg.grid_divisions - 1
    )
    return c[0], c[1]


def _explore_onehot(pos: jnp.ndarray, cfg: EnvConfig) -> jnp.ndarray:
    """One-hot [D, D] mask of the explore cell.  Visit-grid reads/updates go
    through dense outer-product masks instead of gather/scatter — at D=10
    that is 100 VPU flops per env per step, far cheaper on TPU than a
    scattered index op across thousands of vmapped envs."""
    cx, cy = _explore_cell(pos, cfg)
    d = cfg.grid_divisions
    oh_x = jax.nn.one_hot(cx, d, dtype=jnp.float32)
    oh_y = jax.nn.one_hot(cy, d, dtype=jnp.float32)
    return oh_x[:, None] * oh_y[None, :]


def observe(state: EnvState, cfg: EnvConfig, bank=None) -> jnp.ndarray:
    """Reference ``_get_obs`` (PPOV1.1/environment.py:64-80); field values
    come from the state's cached current-cell sample.  3-D flight inserts
    z/domain_height after (x, y) — obs_dim 7."""
    conc, tke = state.conc, state.tke
    mask = _explore_onehot(state.pos, cfg)
    visits = jnp.sum(state.visited.astype(jnp.float32) * mask)
    explore_level = jnp.minimum(visits / cfg.explore_visit_norm, 1.0)
    parts = [
        state.pos[0] / cfg.grid_size,
        state.pos[1] / cfg.grid_size,
    ]
    if cfg.env_3d:
        parts.append(state.pos[2] / cfg.domain_height)
    parts += [
        conc / cfg.conc_peak,
        tke / (cfg.turbulence_intensity * 3.0),
        state.t.astype(jnp.float32) / cfg.max_steps,
        explore_level,
    ]
    obs = jnp.stack(parts).astype(jnp.float32)
    if cfg.obs_memory:
        delta = (conc - state.prev_conc) / cfg.conc_peak
        prev_oh = jax.nn.one_hot(state.prev_action, cfg.num_actions, dtype=jnp.float32)
        obs = jnp.concatenate([obs, delta[None].astype(jnp.float32), prev_oh])
    return obs


def reset(
    key: jax.Array,
    cfg: EnvConfig,
    radius: jnp.ndarray | float | None = None,
    explore_bonus: jnp.ndarray | float | None = None,
    bank=None,
):
    """Reference ``reset`` (PPOV1.1/environment.py:41-49): fresh source +
    field, agent at the origin, cleared visit grid.  Curriculum values are
    carried in the state so vmapped auto-resets preserve them."""
    if radius is None:
        radius = cfg.initial_radius
    if explore_bonus is None:
        explore_bonus = cfg.explore_bonus_init
    d = cfg.grid_divisions
    field = new_field(key, cfg, bank)
    pos = jnp.zeros(cfg.pos_dim, jnp.float32)
    conc0, tke0 = sample_conc_tke(
        field, jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32), cfg, bank,
        t=jnp.zeros((), jnp.int32),
        z=pos[2] if cfg.env_3d else None,
        xy=pos[:2],
    )
    state = EnvState(
        pos=pos,
        t=jnp.zeros((), jnp.int32),
        visited=jnp.zeros((d, d), jnp.int32),
        field=field,
        radius=jnp.asarray(radius, jnp.float32),
        explore_bonus=jnp.asarray(explore_bonus, jnp.float32),
        conc=conc0,
        tke=tke0,
        prev_conc=conc0,
        prev_action=jnp.zeros((), jnp.int32),
    )
    return state, observe(state, cfg, bank)


# Action table (reference step(): stay / +y / -y / +x / -x, environment.py:91-93;
# 3-D flight appends +z / -z at the vertical step size).
def _action_delta(action: jnp.ndarray, cfg: EnvConfig) -> jnp.ndarray:
    m = cfg.move_step
    rows = [
        [0.0, 0.0], [0.0, m], [0.0, -m], [m, 0.0], [-m, 0.0],
    ]
    if cfg.env_3d:
        zm = cfg.z_move_step
        rows = [r + [0.0] for r in rows] + [[0.0, 0.0, zm], [0.0, 0.0, -zm]]
    table = jnp.array(rows, jnp.float32)
    return table[action]


def step(state: EnvState, action: jnp.ndarray, key: jax.Array, cfg: EnvConfig, bank=None):
    """Reference ``step`` (PPOV1.1/environment.py:82-168), order-faithful."""
    return step_noise(
        state, action, jax.random.normal(key, (cfg.pos_dim,), jnp.float32), cfg, bank
    )


def step_noise(
    state: EnvState,
    action: jnp.ndarray,
    turb_noise: jnp.ndarray,
    cfg: EnvConfig,
    bank=None,
):
    """``step`` with the turbulence-displacement N(0,1) pair supplied by the
    caller — lets rollouts pregenerate all randomness in one vectorized draw
    outside the scan instead of splitting keys every step."""
    g = float(cfg.grid_size)
    move_step = cfg.move_step
    tke_norm = cfg.turbulence_intensity * 3.0
    if cfg.elastic_walls and cfg.env_3d:
        raise ValueError("elastic_walls (v1_0) is a 2-D-only reward variant")

    t_new = state.t + 1

    # Concentration before the move, at the old cell (lines 86-88) — the
    # cached sample from the previous step (deterministic field => exact).
    prev_conc, prev_tke = state.conc, state.tke
    prev_conc_n = prev_conc / cfg.conc_peak

    # Deterministic displacement + move penalty (V1.1 lines 91-95; V1.0 uses
    # a flat -0.05 per-step penalty, ppo0.0.py:169).
    delta = _action_delta(action, cfg)
    delta_norm = jnp.linalg.norm(delta)
    if cfg.reward_variant == "v1_0":
        move_penalty = jnp.float32(-cfg.v10_flat_move_penalty)
    elif cfg.env_3d:
        # vertical steps are full moves despite the smaller step size
        move_magnitude = (delta_norm > 0.0).astype(jnp.float32)
        move_penalty = -cfg.move_penalty_coef * (1.0 - move_magnitude)
    else:
        move_magnitude = delta_norm / move_step
        move_penalty = -cfg.move_penalty_coef * (1.0 - move_magnitude)

    # Stochastic turbulence displacement from TKE at the old cell (lines 98-101).
    turb_eff = (
        move_step
        * cfg.turb_displacement_coef
        * turb_noise
        * prev_tke
        / tke_norm
    )
    raw = state.pos + delta + turb_eff

    # Horizontal advection by the field wind (WRF-LES coupling; 0 by default).
    if cfg.wind_advect_coef:
        if cfg.plume_model == "gridded":
            from tpu_plume.fields.gridded import bank_wind

            wvec = bank_wind(bank, state.field.idx, t_new)
        else:
            wvec = state.field.wind
        advect = cfg.wind_advect_coef * wvec
        if cfg.env_3d:
            advect = jnp.concatenate([advect, jnp.zeros(1, jnp.float32)])
        raw = raw + advect

    if cfg.elastic_walls:
        # V1.0 bounce-back walls (PPOV1.0/ppo0.0.py:151-154): clip to a 10%
        # margin, then revert the whole move if any coordinate left the domain.
        cand = jnp.clip(raw, -0.1 * g, 1.1 * g)
        out = jnp.any((cand < 0.0) | (cand > g))
        new_pos = jnp.where(out, state.pos, cand)
    elif cfg.env_3d:
        new_pos = jnp.concatenate(
            [
                jnp.clip(raw[:2], 0.0, g - cfg.clip_edge_eps),
                jnp.clip(raw[2:], 0.0, cfg.domain_height),
            ]
        )
    else:
        new_pos = jnp.clip(raw, 0.0, g - cfg.clip_edge_eps)

    # Boundary penalty: V1.1+ fires near a wall while moving down-gradient
    # (lines 108-124); V1.0 is a flat -0.5 inside a 10% margin
    # (ppo0.0.py:176-182).
    ix1, iy1 = _cell(new_pos, cfg)
    cur_conc, cur_tke = sample_conc_tke(
        state.field, ix1, iy1, cfg, bank, t=t_new,
        z=new_pos[2] if cfg.env_3d else None,
        xy=new_pos[:2],
    )
    cur_conc_n = cur_conc / cfg.conc_peak
    border_units = jnp.minimum(
        jnp.minimum(new_pos[0], g - new_pos[0]),
        jnp.minimum(new_pos[1], g - new_pos[1]),
    )
    if cfg.reward_variant == "v1_0":
        boundary_penalty = jnp.where(
            border_units < cfg.v10_boundary_margin_frac * g,
            -cfg.v10_boundary_penalty,
            0.0,
        )
    else:
        conc_gradient = (cur_conc_n - prev_conc_n) / (delta_norm + 1e-6)
        boundary_dist = border_units / g
        boundary_penalty = jnp.where(
            (boundary_dist < cfg.boundary_decay_start)
            & (conc_gradient < cfg.boundary_gradient_gate),
            -cfg.boundary_penalty * (cfg.boundary_decay_start - boundary_dist) ** 2,
            0.0,
        )

    # Exploration bookkeeping at the new cell (lines 126-133): the visit is
    # counted first, then both the explore_level and the 1/(visits^0.75 + 1)
    # attenuation read the post-increment count.
    mask = _explore_onehot(new_pos, cfg)
    visited = state.visited + mask.astype(state.visited.dtype)
    visits = jnp.sum(visited.astype(jnp.float32) * mask)
    explore_level = jnp.minimum(visits / cfg.explore_visit_norm, 1.0)
    if cfg.reward_variant == "v1_0":
        # V1.0: bonus / (visits + 1) (ppo0.0.py:164)
        explore_reward = state.explore_bonus / (visits + 1.0)
    else:
        explore_reward = (
            state.explore_bonus * (1.0 - explore_level)
            / (visits**cfg.explore_visit_pow + 1.0)
        )

    new_state = state.replace(
        pos=new_pos.astype(jnp.float32), t=t_new, visited=visited,
        conc=cur_conc, tke=cur_tke,
        prev_conc=prev_conc, prev_action=action.astype(jnp.int32),
    )
    obs = observe(new_state, cfg, bank)

    tke_n = cur_tke / tke_norm
    if cfg.reward_variant == "delta":
        # README-specified reward R = Δ[CH4] − 0.2‖Δθ‖ (reference
        # README.md:97-99; implemented by no reference code — SURVEY §2.2):
        # reward the concentration *change* (gradient ascent), penalize
        # heading changes by (1−cosΔθ)/2 ∈ {0, ½, 1} for axis actions.
        conc_reward = cfg.conc_reward_coef * (cur_conc_n - prev_conc_n)
        if cfg.inplume_bonus > 0.0:
            # contact-riding shaping (EnvConfig.inplume_bonus): the delta
            # term is zero while HOLDING plume contact, which starves the
            # model-fit guide of samples on narrow anisotropic ridges
            conc_reward = conc_reward + cfg.inplume_bonus * (
                cur_conc_n >= cfg.inplume_conc_floor
            )
        d_prev = _action_delta(state.prev_action, cfg)
        dot = jnp.sum(d_prev * delta)
        norms = jnp.linalg.norm(d_prev) * delta_norm
        cos = jnp.where(norms > 0.0, dot / jnp.maximum(norms, 1e-6), 1.0)
        move_penalty = move_penalty - cfg.readme_turn_penalty * 0.5 * (1.0 - cos)
    else:
        conc_reward = cfg.conc_reward_coef * cur_conc_n
    tke_penalty = -cfg.tke_penalty_factor * tke_n
    total_reward = (
        conc_reward + explore_reward + move_penalty + tke_penalty + boundary_penalty
    )

    # Terminal bonus within the curriculum radius (V1.1 lines 147-151:
    # min(500, 150*R0/R); V1.0: uncapped 100*R0/R, ppo0.0.py:186-187).
    # Success is a horizontal gate (the source is a ground (x, y) point; the
    # reference's deviation metric is planimetric).  Multi-source fields
    # gate on the NEAREST source.
    if cfg.num_sources > 1:
        from tpu_plume.fields.analytic import all_sources

        srcs = all_sources(state.field, cfg)
        distance = jnp.min(jnp.linalg.norm(new_pos[None, :2] - srcs, axis=-1))
    else:
        distance = jnp.linalg.norm(new_pos[:2] - state.field.source)
    reached = distance <= state.radius
    if cfg.reward_variant == "v1_0":
        terminal_bonus = 100.0 * (cfg.initial_radius / state.radius)
    else:
        terminal_bonus = jnp.minimum(
            cfg.terminal_bonus_cap,
            cfg.terminal_bonus_coef * (cfg.initial_radius / state.radius),
        )
    if cfg.terminal_depth_coef:
        depth = jnp.maximum(state.radius - distance, 0.0) / state.radius
        if cfg.terminal_depth_power != 1.0:
            depth = depth ** cfg.terminal_depth_power
        terminal_bonus = terminal_bonus + cfg.terminal_depth_coef * depth
    if cfg.terminal_gate_radius:
        # Pay the terminal bonus only for crossings at least as deep as
        # the gate — the eval metric itself (success = dev <= 40).
        terminal_bonus = terminal_bonus * (
            distance <= cfg.terminal_gate_radius
        ).astype(jnp.float32)
    total_reward = total_reward + jnp.where(reached, terminal_bonus, 0.0)

    done = (t_new >= cfg.max_steps) | reached

    info = RewardInfo(
        concentration_reward=conc_reward,
        explore_reward=explore_reward,
        move_penalty=move_penalty,
        tke_penalty=tke_penalty,
        boundary_penalty=boundary_penalty,
        reached=reached,
        distance=distance,
        conc_raw=cur_conc,
    )
    return new_state, Transition(
        obs=obs, reward=total_reward.astype(jnp.float32), done=done, info=info
    )


def auto_reset(
    state: EnvState,
    obs: jnp.ndarray,
    done: jnp.ndarray,
    key: jax.Array,
    cfg: EnvConfig,
    bank=None,
):
    """Branchless episode boundary: when ``done``, swap in a freshly-reset
    state (new source + turbulence seed) while carrying the curriculum values.
    Replaces the reference's per-episode Python ``env.reset()`` so the whole
    rollout stays inside one compiled scan.  ``obs`` is the post-step
    observation (from the Transition) to avoid recomputing it."""
    fresh, fresh_obs = reset(key, cfg, state.radius, state.explore_bonus, bank)
    next_state = jax.tree.map(
        lambda a, b: jnp.where(done, a, b), fresh, state
    )
    return next_state, jnp.where(done, fresh_obs, obs)


def auto_reset_from_draws(
    state: EnvState,
    obs: jnp.ndarray,
    done: jnp.ndarray,
    u_src: jnp.ndarray,
    u_wind: jnp.ndarray,
    bits: jnp.ndarray,
    cfg: EnvConfig,
    bank=None,
):
    """``auto_reset`` from pregenerated uniform draws (no in-scan threefry) —
    the rollout hot path."""
    from tpu_plume.fields.analytic import new_field_from_draws

    field = new_field_from_draws(u_src, u_wind, bits, cfg, bank)
    pos0 = jnp.zeros(cfg.pos_dim, jnp.float32)
    conc0, tke0 = sample_conc_tke(
        field, jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32), cfg, bank,
        t=jnp.zeros((), jnp.int32),
        z=pos0[2] if cfg.env_3d else None,
        xy=pos0[:2],
    )
    d = cfg.grid_divisions
    fresh = EnvState(
        pos=pos0,
        t=jnp.zeros((), jnp.int32),
        visited=jnp.zeros((d, d), jnp.int32),
        field=field,
        radius=state.radius,
        explore_bonus=state.explore_bonus,
        conc=conc0,
        tke=tke0,
        prev_conc=conc0,
        prev_action=jnp.zeros((), jnp.int32),
    )
    next_state = jax.tree.map(lambda a, b: jnp.where(done, a, b), fresh, state)
    fresh_obs = observe(fresh, cfg, bank)
    return next_state, jnp.where(done, fresh_obs, obs)
