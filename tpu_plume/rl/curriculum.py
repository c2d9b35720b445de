"""Curriculum controller as a pure state transition.

Reference: ``PPOTrainer.update`` (PPOV1.1/model.py:121-164,
PPOV2.1/model.py:178-221): a success-history window of 120 episodes; when the
window fills, (a) the exploration bonus decays by DECAY_FACTOR^(1 +
success_rate) with a 0.1 floor, (b) the goal radius shrinks by
RADIUS_DECAY^(2 + 3*(rate - 0.6)) when rate > 0.6 or expands by 1.1x when
rate < 0.25, (c) an anti-oscillation clamp limits the per-update radius move
to +-5, and the window resets.

Batched TPU form: with N vmapped envs completing episodes asynchronously
there is no serial episode order, so the window is an accumulator of
(successes, episodes) counts, matching the serial semantics in expectation
(SURVEY.md §7 "hard parts").  At large batch sizes a single train iteration
can complete many windows' worth of episodes (4096 envs x 128 steps finishes
~900 episodes vs window_size=120), so the transition fires
``count // window_size`` times per call — each sub-window at the aggregate
rate — rather than once, preserving the reference's *per-120-episode* decay
cadence; the remainder (with proportional successes) carries into the next
window.  The whole transition is jnp arithmetic + a ``fori_loop`` over the
fire count — jit-safe, carried in the training loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from tpu_plume.core.config import CurriculumConfig


@struct.dataclass
class CurriculumState:
    radius: jnp.ndarray          # f32 current goal radius
    explore_bonus: jnp.ndarray   # f32 current exploration bonus
    success_count: jnp.ndarray   # i32 successes in the open window
    episode_count: jnp.ndarray   # i32 episodes in the open window
    num_updates: jnp.ndarray     # i32 windows closed so far (diagnostics)


def curriculum_init(cfg: CurriculumConfig, explore_bonus_init: float) -> CurriculumState:
    return CurriculumState(
        radius=jnp.float32(cfg.initial_radius),
        explore_bonus=jnp.float32(explore_bonus_init),
        success_count=jnp.int32(0),
        episode_count=jnp.int32(0),
        num_updates=jnp.int32(0),
    )


def curriculum_update(
    state: CurriculumState,
    new_successes: jnp.ndarray,   # i32: episodes that ended in success this iter
    new_episodes: jnp.ndarray,    # i32: episodes that ended this iter
    cfg: CurriculumConfig,
) -> CurriculumState:
    if cfg.variant == "simple":
        return _curriculum_update_simple(state, new_successes, new_episodes, cfg)
    succ = state.success_count + new_successes.astype(jnp.int32)
    count = state.episode_count + new_episodes.astype(jnp.int32)
    rate = succ.astype(jnp.float32) / jnp.maximum(count.astype(jnp.float32), 1.0)
    # One fire per completed window (count // window_size, not a single fire):
    # at 4096-env scale an iteration completes many windows — see module doc.
    n_fires = count // cfg.window_size

    def one_fire(_, carry):
        radius, bonus = carry
        # (a) exploration-bonus decay (model.py:139-144).
        bonus = jnp.maximum(
            bonus * cfg.explore_decay_factor ** (1.0 + rate),
            cfg.explore_bonus_floor,
        )
        # (b) radius shrink / expand (model.py:146-157).
        shrink = radius * cfg.radius_decay ** (
            2.0 + 3.0 * (rate - cfg.success_threshold)
        )
        shrunk = jnp.maximum(cfg.min_radius, shrink)
        expanded = jnp.minimum(cfg.initial_radius, radius * cfg.expand_rate)
        new_radius = jnp.where(
            rate > cfg.success_threshold,
            shrunk,
            jnp.where(rate < cfg.expand_below, expanded, radius),
        )
        # (c) anti-oscillation clamp vs the radius the window ran at
        # (model.py:159-161).
        delta = new_radius - radius
        clamped = jnp.where(
            jnp.abs(delta) > cfg.anti_oscillation_clamp,
            radius + cfg.anti_oscillation_clamp * jnp.sign(delta),
            new_radius,
        )
        return clamped, bonus

    radius, bonus = jax.lax.fori_loop(
        0, n_fires, one_fire, (state.radius, state.explore_bonus)
    )
    # Remainder window carries over with proportional successes.
    rem_count = count - n_fires * cfg.window_size
    rem_succ = jnp.round(
        rate * rem_count.astype(jnp.float32)
    ).astype(jnp.int32)

    return CurriculumState(
        radius=radius,
        explore_bonus=bonus,
        success_count=jnp.where(n_fires > 0, rem_succ, succ),
        episode_count=jnp.where(n_fires > 0, rem_count, count),
        num_updates=state.num_updates + n_fires,
    )


def _curriculum_update_simple(
    state: CurriculumState,
    new_successes: jnp.ndarray,
    new_episodes: jnp.ndarray,
    cfg: CurriculumConfig,
) -> CurriculumState:
    """PPOV1.0 controller (ppo0.0.py:261-287): explore bonus decays every
    episode (batched: decay^new_episodes), radius only shrinks by
    RADIUS_DECAY when the window's success rate exceeds the threshold."""
    succ = state.success_count + new_successes.astype(jnp.int32)
    count = state.episode_count + new_episodes.astype(jnp.int32)
    n_fires = count // cfg.window_size
    rate = succ.astype(jnp.float32) / jnp.maximum(count.astype(jnp.float32), 1.0)

    bonus = jnp.maximum(
        state.explore_bonus
        * cfg.explore_decay_factor ** new_episodes.astype(jnp.float32),
        cfg.explore_bonus_floor,
    )
    shrinks = jnp.where(rate > cfg.success_threshold, n_fires, 0)
    new_radius = jnp.maximum(
        cfg.min_radius,
        state.radius * cfg.radius_decay ** shrinks.astype(jnp.float32),
    )
    rem_count = count - n_fires * cfg.window_size
    rem_succ = jnp.round(rate * rem_count.astype(jnp.float32)).astype(jnp.int32)
    return CurriculumState(
        radius=new_radius,
        explore_bonus=bonus,
        success_count=jnp.where(n_fires > 0, rem_succ, succ),
        episode_count=jnp.where(n_fires > 0, rem_count, count),
        num_updates=state.num_updates + shrinks,
    )
