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
from tpu_plume.evaluation import make_oracle

cfg0 = get_preset("ppo_v2_0").env
import dataclasses
cfg = dataclasses.replace(cfg0)  # radius fixed at 50 by protocol (reset default)


def run(policy, episodes=2000, seed=0):
    key = jax.random.PRNGKey(seed)
    succ = fails_shallow = nofind = 0
    devs = []
    act = jax.jit(make_oracle(policy, cfg))  # the package teacher policies
    step_j = jax.jit(lambda s, a, k: methane.step(s, a, k, cfg))
    for ep in range(episodes):
        key, rk = jax.random.split(key)
        state, _ = methane.reset(rk, cfg)
        done = False
        for t in range(cfg.max_steps):
            key, sk = jax.random.split(key)
            state, tr = step_j(state, act(state), sk)
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
