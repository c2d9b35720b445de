"""Provenance for the round-3 fused-train-step perf study (RESULTS.md
"Fused-train-step perf study"): pipelined rollout-vs-update split,
epoch/minibatch chain bisect, and the f32-vs-bf16 end-to-end A/B, all at
the flagship bench config (4096 envs x 128 unroll, 5 epochs x 8
minibatches).

Timing discipline (CLAUDE.md): one scalar host transfer per K-iteration
window so the ~30 ms tunnel RTT amortizes away; block_until_ready is NOT
trusted on this backend.

Usage: python scripts/perf_split.py [split|bisect|bf16]...
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/tpu_plume_jax")
)

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

from tpu_plume.core.config import (  # noqa: E402
    CurriculumConfig, EnvConfig, PPOConfig, RolloutConfig, TrainConfig,
)
from tpu_plume.models import ActorCritic  # noqa: E402
from tpu_plume.rl.curriculum import curriculum_init  # noqa: E402
from tpu_plume.rollout import init_rollout, rollout_chunk  # noqa: E402
from tpu_plume.train.ppo_trainer import (  # noqa: E402
    LoopCarry, build_train_step, make_train_state,
)

N, T = 4096, 128
BATCH = N * T
ENV = EnvConfig(max_steps=1000, plume_sigma=500 / 16)
KEY = jax.random.PRNGKey(0)
K_MODEL, K_ROLL, K_LOOP = jax.random.split(KEY, 3)
K_WINDOW = 24


def _cfg(epochs=5, minibatches=8, bf16=False, bf16_update=False,
         f32_heads=False):
    return TrainConfig(
        name="bench", env=ENV,
        ppo=PPOConfig(minibatch_size=BATCH // minibatches, epochs=epochs,
                      bf16_compute=bf16, bf16_update=bf16_update,
                      f32_heads=f32_heads),
        curriculum=CurriculumConfig(),
        rollout=RolloutConfig(num_envs=N, unroll_length=T),
    )


def _time_full(cfg, tag):
    ts = make_train_state(cfg, K_MODEL)
    c = init_rollout(K_ROLL, cfg.env, N, radius=50.0, explore_bonus=0.6)
    loop = LoopCarry(train_state=ts, rollout=c,
                     curriculum=curriculum_init(cfg.curriculum, 0.6),
                     key=K_LOOP)
    step_j = jax.jit(build_train_step(cfg, bank=None))
    out = step_j(loop)
    loop = out[0]
    _ = float(out[1]["loss/total"])
    t0 = time.perf_counter()
    for _ in range(K_WINDOW):
        out = step_j(loop)
        loop = out[0]
    _ = float(out[1]["loss/total"])
    dt = (time.perf_counter() - t0) / K_WINDOW
    print(f"{tag}: {dt*1e3:.2f} ms/iter -> {N*T/dt/1e6:.2f}M env-steps/s",
          flush=True)
    return dt


def split():
    """Rollout-only vs full-step pipelined timing."""
    cfg = _cfg()
    ts = make_train_state(cfg, K_MODEL)
    c = init_rollout(K_ROLL, cfg.env, N, radius=50.0, explore_bonus=0.6)
    model = ActorCritic(num_actions=cfg.env.num_actions)

    def roll_only(params, cr):
        c2, traj, boot = rollout_chunk(params, model.apply, cr, cfg.env, T)
        return c2, traj.reward.sum() + boot.sum()

    roll_j = jax.jit(roll_only)
    c, s = roll_j(ts.params, c)
    _ = float(s)
    t0 = time.perf_counter()
    for _ in range(K_WINDOW):
        c, s = roll_j(ts.params, c)
    _ = float(s)
    dt = (time.perf_counter() - t0) / K_WINDOW
    print(f"rollout pipelined: {dt*1e3:.2f} ms/iter "
          f"-> {N*T/dt/1e6:.2f}M steps/s", flush=True)
    full = _time_full(cfg, "full pipelined")
    print(f"update ~= {1e3*(full-dt):.2f} ms", flush=True)


def bisect():
    """Chain-count scaling (traffic-bound diagnosis)."""
    for tag, e, m in (("5x8", 5, 8), ("1x8", 1, 8), ("5x1", 5, 1),
                      ("1x1", 1, 1)):
        _time_full(_cfg(epochs=e, minibatches=m), f"{tag} chains={e*m}")


def bf16():
    """f32-vs-bf16 end-to-end A/B (the false-negative fix)."""
    _time_full(_cfg(bf16=False), "f32")
    _time_full(_cfg(bf16=True), "bf16")


def heads():
    """Round-5 terminal-precision split: does f32_heads cost throughput
    on top of bf16_update at flagship scale?"""
    _time_full(_cfg(bf16=False), "f32")
    _time_full(_cfg(bf16_update=True), "bf16-update")
    _time_full(_cfg(bf16_update=True, f32_heads=True), "bf16-update+f32-heads")


if __name__ == "__main__":
    for mode in (sys.argv[1:] or ["split"]):
        {"split": split, "bisect": bisect, "bf16": bf16,
         "heads": heads}[mode]()
