"""Scripted oracle policies (true source position known), as jittable
functions of the env state.

These are the privileged teachers behind the success@40 ceiling study
(scripts/oracle_ceiling.py): a perfect-information *staircase* scores ~42%
under the radius-50 greedy protocol — exactly where every trained policy
sits — while adding approach-*phase* control (set up the crossing step so
it lands deep instead of on a random chord) lifts the ceiling to ~85%.
Collecting (obs, action) demonstrations from the ``phase`` oracle gives an
imitation signal for exactly the skill PPO does not discover on its own;
the learner sees only its own observations, so this is the standard
privileged-teacher / student distillation setup (the reference's expert
pipeline, PPOV1.1/generate_expert_data.py:14-61, uses a *trained policy*
as the expert — same npz contract, stronger teacher).

All three policies are pure jnp functions of ``EnvState`` (position +
true source), vmappable across the env batch and usable inside the
jitted expert-collection scan — no host loop.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from tpu_plume.core.config import EnvConfig

ORACLE_KINDS = ("naive", "look1", "phase", "raster")


def make_oracle(
    kind: str,
    cfg: EnvConfig,
    *,
    terminate_radius: float | None = None,
    success_radius: float = 40.0,
    target_depth: float = 31.0,
    raster_band_scale: float = 1.12,
):
    """Build ``fn(env_state) -> i32 action`` for one oracle policy.

    naive  — step along the axis with the larger |component| toward the
             source (the chemotaxis staircase RL converges to).
    look1  — one-step lookahead: if some action's deterministic landing is
             inside the goal ball (<= success_radius), take the landing
             closest to ``target_depth``; otherwise the staircase move.
    phase  — look1 + approach-phase control: when every crossing action
             would land shallow, take the non-crossing action whose NEXT
             step can land deepest (2-step greedy).
    raster — NON-privileged boustrophedon surveyor (reads only the agent's
             own position, never the source): sweep rows of pitch ~1.1
             sigma.  By itself it only crosses the goal ball on a chord;
             composed with the terminal guide (``eval --oracle raster
             --guide fit``) it demonstrates the full search->localize->
             dive system with zero learned components.

    ``terminate_radius=None`` (default) reads the EPISODE's own radius
    from ``state.radius`` — under curriculum training the terminate ball
    shrinks, and a teacher pinned to the protocol's 50 would teach the
    student to hover outside a ball the episode never ends at (measured:
    it stalls the curriculum at its first shrink).  ``success_radius`` /
    ``target_depth`` then scale with it (0.8 x and 0.62 x — the protocol's
    40/50 and 31/50).  Pass explicit values to pin the protocol geometry
    (e.g. expert collection at reset-default radius 50).  2-D policies:
    the z component of a 3-D flight is ignored.
    """
    if kind not in ORACLE_KINDS:
        raise ValueError(f"unknown oracle {kind!r}; pick from {ORACLE_KINDS}")
    m = float(cfg.move_step)
    dynamic = terminate_radius is None

    def _geometry(state):
        if dynamic:
            tr = state.radius
            return tr, 0.8 * tr, 0.62 * tr
        return (
            jnp.float32(terminate_radius),
            jnp.float32(success_radius),
            jnp.float32(target_depth),
        )

    deltas = jnp.array(
        [[0.0, 0.0], [0.0, m], [0.0, -m], [m, 0.0], [-m, 0.0]], jnp.float32
    )

    if kind == "raster":
        g = float(cfg.grid_size)
        # band pitch in plume sigmas: 1.12 reads every dispersion band;
        # the two-pass flux survey widens it so a SHORTENED pass-1 budget
        # still covers the whole domain (detection only needs ~2 sigma)
        band_h = raster_band_scale * float(cfg.plume_sigma)
        # DESCEND-FIRST (round 5): the sweep is stateless (band from y,
        # turns always go +y), so a flight spawning high covered only the
        # strip above it and then parked in the top corner — the dominant
        # unobserved-source pool in the flux study.  The first
        # grid/move steps go straight down (the env clips at the wall),
        # anchoring every episode's serpentine at y=0 with full upward
        # range.  state.t makes this a pure function of the env state.
        t_desc = int(g / m)

        def act_raster(state) -> jnp.ndarray:
            x, y = state.pos[0], state.pos[1]
            band = jnp.floor(y / band_h).astype(jnp.int32)
            going_right = band % 2 == 0
            turn = jnp.where(going_right, x >= g - 1.2 * m, x <= 1.2 * m)
            sweep = jnp.where(
                turn, 1, jnp.where(going_right, 3, 4)
            ).astype(jnp.int32)
            return jnp.where(state.t < t_desc, 2, sweep).astype(jnp.int32)

        return act_raster

    def act(state) -> jnp.ndarray:
        tr, success_r, target_d = _geometry(state)
        pos = state.pos[:2]
        src = state.field.source[:2]
        to = src - pos
        stair = jnp.where(
            jnp.abs(to[0]) >= jnp.abs(to[1]),
            jnp.where(to[0] > 0, 3, 4),
            jnp.where(to[1] > 0, 1, 2),
        ).astype(jnp.int32)
        if kind == "naive":
            return stair

        land = pos[None, :] + deltas                        # [5, 2]
        ld = jnp.linalg.norm(land - src[None, :], axis=-1)  # [5]
        crossing = ld <= tr
        deep = crossing & (ld <= success_r)
        a_deep = jnp.argmin(
            jnp.where(deep, jnp.abs(ld - target_d), 1e9)
        ).astype(jnp.int32)
        any_deep = deep.any()
        if kind == "look1":
            return jnp.where(any_deep, a_deep, stair)

        # phase: among non-crossing actions, prefer the one whose next step
        # can land closest to target_depth (2-step greedy); if no next-step
        # deep landing exists anywhere, close the distance.  (At small
        # curriculum radii deep landings become unreachable with 25-unit
        # moves and this degrades gracefully to pure approach.)
        ld2 = jnp.linalg.norm(
            land[:, None, :] + deltas[None, :, :] - src[None, None, :], axis=-1
        )                                                   # [5, 5]
        deep2 = (ld2 <= success_r) & (ld2 >= m)
        best_next = jnp.min(
            jnp.where(deep2, jnp.abs(ld2 - target_d), 1e9), axis=-1
        )                                                   # [5]
        dist_after = jnp.linalg.norm(land - src[None, :], axis=-1)
        score = jnp.where(deep2.any(axis=-1), -best_next, -100.0 - dist_after)
        score = jnp.where(crossing, -1e18, score)           # never cross shallow
        a_phase = jnp.argmax(score).astype(jnp.int32)
        return jnp.where(any_deep, a_deep, a_phase)

    return act
