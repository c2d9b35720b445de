"""GAIL: PPO + discriminator, optionally closed-loop.

Reference: ``train_ppo_gail`` (PPOV1.1/train_ppo_gail.py:34-200) runs the
standard PPO loop and, once per episode, updates a real/fake discriminator on
expert vs policy (state, one-hot action) batches.  Notably the discriminator
output never modifies the PPO reward — the imitation loop is OPEN in the
reference (SURVEY.md §3.2).

Here both modes exist in one fused train step:
  - ``closed_loop=False`` (reference-faithful): discriminator trains
    alongside PPO, rewards untouched;
  - ``closed_loop=True`` (corrected): the env reward is augmented with the
    imitation reward ``softplus(D_logit)`` = -log(1 - D(s,a)) before GAE,
    weighted by ``gail_reward_coef``.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.training.train_state import TrainState

from tpu_plume.core.config import TrainConfig
from tpu_plume.models import Discriminator
from tpu_plume.models.discriminator import bce_with_logits
from tpu_plume.rl.curriculum import curriculum_init, curriculum_update
from tpu_plume.rl.gae import compute_gae
from tpu_plume.rl.ppo import PPOBatch, normalize_advantages, ppo_update
from tpu_plume.rollout.rollout import init_rollout, rollout_chunk
from tpu_plume.train.ppo_trainer import LoopCarry, make_train_state


@struct.dataclass
class GAILCarry:
    ppo: LoopCarry
    disc_state: TrainState


@dataclasses.dataclass
class GAILResult:
    params: Any
    disc_params: Any
    episodes: int
    successes: int
    out_dir: str


def make_disc_state(cfg: TrainConfig, key: jax.Array, lr: float = 1e-3) -> TrainState:
    model = Discriminator()
    params = model.init(
        key, jnp.zeros((1, cfg.env.obs_dim)), jnp.zeros((1, cfg.env.num_actions))
    )
    return TrainState.create(
        apply_fn=model.apply, params=params, tx=optax.adam(lr)
    )


def build_gail_train_step(
    cfg: TrainConfig,
    expert_states: jnp.ndarray,
    expert_actions: jnp.ndarray,
    *,
    closed_loop: bool = False,
    disc_batch: int = 1024,
):
    """The imitation-reward weight is a DEVICE argument (not a traced
    constant) so the host can anneal it across iterations without
    recompiling — the closed-loop study's practical recipe (RESULTS.md):
    bootstrap with imitation, anneal to 0 for the precision endgame."""
    env_cfg, ppo_cfg, cur_cfg = cfg.env, cfg.ppo, cfg.curriculum
    T = cfg.rollout.unroll_length
    num_actions = cfg.env.num_actions
    expert_n = expert_states.shape[0]

    def train_step(carry: GAILCarry, gail_coef: jnp.ndarray):
        loop, disc_state = carry.ppo, carry.disc_state
        key, k_update, k_exp, k_pol = jax.random.split(loop.key, 4)

        n = loop.rollout.obs.shape[0]
        env_state = loop.rollout.env_state.replace(
            radius=jnp.broadcast_to(loop.curriculum.radius, (n,)),
            explore_bonus=jnp.broadcast_to(loop.curriculum.explore_bonus, (n,)),
        )
        rcarry = loop.rollout.replace(env_state=env_state)
        rcarry, traj, bootstrap = rollout_chunk(
            loop.train_state.params, loop.train_state.apply_fn, rcarry, env_cfg, T
        )

        flat = lambda x: x.reshape((-1,) + x.shape[2:])
        obs_flat = flat(traj.obs)
        act_flat = flat(traj.action)
        act_oh = jax.nn.one_hot(act_flat, num_actions)

        rewards = traj.reward
        if closed_loop:
            # imitation reward -log(1 - D) == softplus(logit)
            logits_d = disc_state.apply_fn(disc_state.params, obs_flat, act_oh)
            imit = jax.nn.softplus(logits_d).reshape(traj.reward.shape)
            rewards = rewards + gail_coef * imit

        advantages, returns = compute_gae(
            rewards, traj.value, traj.done, bootstrap, ppo_cfg.gamma, ppo_cfg.gae_lambda
        )
        batch = PPOBatch(
            obs=obs_flat,
            actions=act_flat,
            old_log_probs=flat(traj.log_prob),
            advantages=normalize_advantages(flat(advantages), ppo_cfg),
            returns=flat(returns),
            old_values=flat(traj.value),
        )
        train_state, loss_metrics = ppo_update(loop.train_state, batch, k_update, ppo_cfg)

        # Discriminator step: expert minibatch vs policy minibatch
        # (train_ppo_gail.py:157-176; loss as model.py:169-188).
        e_idx = jax.random.randint(k_exp, (disc_batch,), 0, expert_n)
        p_idx = jax.random.randint(k_pol, (disc_batch,), 0, obs_flat.shape[0])

        def disc_loss(dp):
            e_logit = disc_state.apply_fn(
                dp, expert_states[e_idx], jax.nn.one_hot(expert_actions[e_idx], num_actions)
            )
            p_logit = disc_state.apply_fn(dp, obs_flat[p_idx], act_oh[p_idx])
            loss = bce_with_logits(e_logit, jnp.ones_like(e_logit)) + bce_with_logits(
                p_logit, jnp.zeros_like(p_logit)
            )
            acc = 0.5 * (
                (e_logit > 0).mean() + (p_logit < 0).mean()
            )
            return loss, acc

        (d_loss, d_acc), d_grads = jax.value_and_grad(disc_loss, has_aux=True)(
            disc_state.params
        )
        disc_state = disc_state.apply_gradients(grads=d_grads)

        new_episodes = traj.done.sum().astype(jnp.int32)
        new_successes = (traj.done & traj.episode.success).sum().astype(jnp.int32)
        curriculum = curriculum_update(loop.curriculum, new_successes, new_episodes, cur_cfg)

        stats = dict(loss_metrics)
        stats.update(
            {
                "rollout/mean_reward": traj.reward.mean(),
                "rollout/episodes": new_episodes,
                "rollout/successes": new_successes,
                "curriculum/radius": curriculum.radius,
                "gail/disc_loss": d_loss,
                "gail/disc_acc": d_acc,
            }
        )
        new_loop = LoopCarry(
            train_state=train_state, rollout=rcarry, curriculum=curriculum, key=key
        )
        return GAILCarry(ppo=new_loop, disc_state=disc_state), stats

    return jax.jit(train_step)


def train_ppo_gail(
    cfg: TrainConfig,
    out_dir: str,
    expert_path: str,
    *,
    closed_loop: bool = False,
    gail_reward_coef: float = 0.1,
    gail_anneal_episodes: int | None = None,
    gail_anneal_radius: float | None = None,
    max_iterations: int | None = None,
    verbose: bool = True,
    sync_every: int = 8,
) -> GAILResult:
    """``gail_anneal_episodes=K`` decays the closed-loop imitation weight
    linearly from ``gail_reward_coef`` to 0 over K episodes — imitation
    bootstrap without the expert-capped asymptote (RESULTS.md closed-loop
    study).  By default the decay starts at episode 0; measured, that
    forfeits the bootstrap (the weight is half-gone before the fast early
    curriculum pays off).  ``gail_anneal_radius=R`` makes the decay
    event-triggered instead: full weight until the curriculum radius first
    reaches R, then the K-episode linear decay."""
    from tpu_plume.data.expert import load_expert_data

    if cfg.ppo.arch != "mlp":
        raise ValueError(
            "GAIL training supports the mlp policy only (the reference's "
            "GAIL is V1.1/MLP, train_ppo_gail.py:34); train the lstm arch "
            "with plain PPO"
        )
    os.makedirs(out_dir, exist_ok=True)
    e_states, e_actions = load_expert_data(expert_path)

    key = jax.random.PRNGKey(cfg.seed)
    k_model, k_disc, k_roll, k_loop = jax.random.split(key, 4)
    loop = LoopCarry(
        train_state=make_train_state(cfg, k_model),
        rollout=init_rollout(
            k_roll, cfg.env, cfg.rollout.num_envs,
            radius=cfg.curriculum.initial_radius,
            explore_bonus=cfg.env.explore_bonus_init,
        ),
        curriculum=curriculum_init(cfg.curriculum, cfg.env.explore_bonus_init),
        key=k_loop,
    )
    carry = GAILCarry(ppo=loop, disc_state=make_disc_state(cfg, k_disc))
    train_step = build_gail_train_step(
        cfg, jnp.asarray(e_states), jnp.asarray(e_actions),
        closed_loop=closed_loop,
    )

    episodes = successes = 0
    iteration = 0
    t0 = time.perf_counter()
    # Per-iteration learning curve (episodes vs success) — the artifact the
    # closed-vs-open-loop study compares; reference GAIL logged TB scalars
    # only (train_ppo_gail.py:178-186).
    curve_path = os.path.join(out_dir, "curve.csv")
    with open(curve_path, "w") as f:
        f.write("iteration,episodes,successes,success_rate,mean_reward,"
                "disc_loss,disc_acc,radius,gail_coef\n")
    if gail_anneal_radius is not None and not gail_anneal_episodes:
        raise ValueError(
            "--gail-anneal-radius only arms the decay trigger; without "
            "--gail-anneal (gail_anneal_episodes) no decay ever happens — "
            "pass both or neither"
        )
    anneal_start = 0 if gail_anneal_radius is None else None

    # Pipelined host sync (same pattern as train_ppo): the device runs up
    # to sync_every iterations ahead; each window's stats come back in ONE
    # stacked transfer.  Per-iteration blocking sync measured ~0.6 s/iter
    # through the ~30 ms-RTT tunnel.  The anneal coefficient therefore
    # reads `episodes` with up to sync_every iterations of lag — a <1%
    # schedule shift at the default window.
    from collections import deque

    pending: deque = deque()

    from tpu_plume.train.hostsync import drain_window

    def consume():
        nonlocal episodes, successes, anneal_start
        window = list(pending)
        pending.clear()
        host = drain_window([st for _, st, _ in window])
        with open(curve_path, "a") as f:
            for stats, (it, _, coef) in zip(host, window):
                it_eps = int(stats["rollout/episodes"])
                it_succ = int(stats["rollout/successes"])
                episodes += it_eps
                successes += it_succ
                if (
                    anneal_start is None
                    and float(stats["curriculum/radius"]) <= gail_anneal_radius
                ):
                    anneal_start = episodes
                f.write(
                    f"{it},{episodes},{successes},"
                    f"{it_succ / max(it_eps, 1):.4f},"
                    f"{float(stats['rollout/mean_reward']):.4f},"
                    f"{float(stats['gail/disc_loss']):.4f},"
                    f"{float(stats['gail/disc_acc']):.4f},"
                    f"{float(stats['curriculum/radius']):.2f},"
                    f"{coef:.5f}\n"
                )
                if verbose and it % 10 == 0:
                    print(
                        f"iter {it:4d} | eps {episodes:6d} | "
                        f"succ {successes / max(episodes, 1):5.1%} | "
                        f"disc_loss {float(stats['gail/disc_loss']):.3f} | "
                        f"disc_acc {float(stats['gail/disc_acc']):.2f}",
                        flush=True,
                    )

    while episodes < cfg.total_episodes:
        if max_iterations is not None and iteration >= max_iterations:
            break
        coef = gail_reward_coef
        if gail_anneal_episodes and anneal_start is not None:
            coef *= max(0.0, 1.0 - (episodes - anneal_start) / gail_anneal_episodes)
        carry, stats = train_step(carry, jnp.float32(coef))
        iteration += 1
        pending.append((iteration, stats, coef))
        if len(pending) >= max(sync_every, 1):
            consume()
    while pending:
        consume()

    from tpu_plume.data.checkpoint import save_checkpoint
    from tpu_plume.data.torch_export import (
        export_actor_critic_pth,
        export_discriminator_pth,
    )

    params = jax.device_get(carry.ppo.train_state.params)
    disc_params = jax.device_get(carry.disc_state.params)
    save_checkpoint(
        os.path.join(out_dir, "checkpoint"),
        {"params": params, "disc_params": disc_params,
         "curriculum": jax.device_get(carry.ppo.curriculum)},
    )
    model_dir = os.path.join(out_dir, "model")
    os.makedirs(model_dir, exist_ok=True)
    export_actor_critic_pth(params, os.path.join(model_dir, "ppo_gail.pth"))
    export_discriminator_pth(disc_params, os.path.join(model_dir, "discriminator.pth"))
    return GAILResult(
        params=params, disc_params=disc_params,
        episodes=episodes, successes=successes, out_dir=out_dir,
    )
