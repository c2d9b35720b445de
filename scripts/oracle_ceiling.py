"""Geometric ceiling for success@40 under the radius-50 greedy protocol.

Scripted ORACLE policies (true source position known) driven through the
real env step (turbulence on), 2000 episodes each:

  naive   — always step along the axis with the larger |component| toward
            the source (the chemotaxis staircase RL converges to).
  look1   — one-step lookahead: if some action's deterministic landing is
            inside the goal ball (<=40), take the deepest such landing in
            (25, 40]; otherwise the staircase move.
  phase   — look1 + phase control: if every crossing action would land
            shallow (40, 50], first take the non-crossing action that best
            sets up a deep landing next step (2-step greedy).

This is an analysis script (not part of the package): it bounds what any
policy could score, isolating geometry+turbulence from learning.
Measured (2000 episodes, seed 0): naive 46.0%, look1 46.0%, phase 84.3%
— i.e. every trained policy at ~46% sits AT the staircase ceiling, and
phase control (not better localization) is the remaining headroom.
"""
import os
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from tpu_plume.core import get_preset
from tpu_plume.env import methane

cfg0 = get_preset("ppo_v2_0").env
import dataclasses
cfg = dataclasses.replace(cfg0)  # radius fixed at 50 by protocol (reset default)
M = cfg.move_step
DELTAS = np.array([[0.0, 0.0], [0.0, M], [0.0, -M], [M, 0.0], [-M, 0.0]], np.float32)


def land_dists(pos, src):
    return np.linalg.norm(pos[None, :] + DELTAS - src[None, :], axis=-1)


def pick(policy, pos, src):
    ld = land_dists(pos, src)
    to = src - pos
    if abs(to[0]) >= abs(to[1]):
        stair = 3 if to[0] > 0 else 4
    else:
        stair = 1 if to[1] > 0 else 2
    if policy == "naive":
        return stair
    # crossing actions and their depths
    crossing = ld <= 50.0
    deep = crossing & (ld <= 40.0)
    if policy in ("look1", "phase"):
        if deep.any():
            # deepest valid landing but not TOO deep (margin for turbulence):
            # target landing ~32; pick landing closest to 31 within (25,40]
            c = np.where(deep, np.abs(ld - 31.0), 1e9)
            return int(np.argmin(c))
        if policy == "look1":
            # no deep landing available: staircase (may cross shallow)
            return stair
        # phase: avoid shallow crossing; consider non-crossing actions and
        # score by whether NEXT step could land deep (2-step greedy)
        best, best_score = stair, -1e9
        for a in range(5):
            if crossing[a]:
                continue
            p2 = pos + DELTAS[a]
            ld2 = land_dists(p2, src)
            deep2 = (ld2 <= 40.0) & (ld2 >= 25.0)
            if deep2.any():
                score = -np.min(np.abs(ld2[deep2] - 31.0))
            else:
                score = -100.0 - np.linalg.norm(p2 - src)
            if score > best_score:
                best, best_score = a, score
        # if everything crosses (d just above 50 with all moves crossing is
        # impossible since 'stay' never crosses), fall back
        return best


def run(policy, episodes=2000, seed=0):
    key = jax.random.PRNGKey(seed)
    succ = fails_shallow = nofind = 0
    devs = []
    step_j = jax.jit(lambda s, a, k: methane.step(s, a, k, cfg))
    for ep in range(episodes):
        key, rk = jax.random.split(key)
        state, _ = methane.reset(rk, cfg)
        src = np.asarray(state.field.source)
        done = False
        for t in range(cfg.max_steps):
            a = pick(policy, np.asarray(state.pos), src)
            key, sk = jax.random.split(key)
            state, tr = step_j(state, jnp.int32(a), sk)
            if bool(tr.done):
                if bool(tr.info.reached):
                    dev = float(tr.info.distance)
                    devs.append(dev)
                    if dev <= 40.0:
                        succ += 1
                    else:
                        fails_shallow += 1
                else:
                    nofind += 1
                done = True
                break
        if not done:
            nofind += 1
    n = episodes
    devs = np.array(devs)
    print(f"{policy:6s}: s@40 {succ/n:6.1%}  shallow-cross {fails_shallow/n:6.1%} "
          f"nofind {nofind/n:5.1%}  landing dev {devs.mean():.1f}+-{devs.std():.1f}")


if __name__ == "__main__":
    for pol in ["naive", "look1", "phase"]:
        run(pol, episodes=int(sys.argv[1]) if len(sys.argv) > 1 else 500)
