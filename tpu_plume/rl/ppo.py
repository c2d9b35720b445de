"""Clipped-surrogate PPO loss and jitted multi-epoch minibatch update.

Reference: ``_update_model`` (PPOV2.0/train_ppo2.0.py:15-88,
PPOV1.1/train_ppo1.0.py:66-139): clipped policy surrogate, clipped value
loss (0.5 * max of clipped/unclipped squared errors vs stored values),
entropy bonus beta=0.01, grad-clip 0.5, Adam lr 3e-5, 5 epochs of shuffled
256-sample minibatches, global advantage normalization with a degenerate-std
guard (train_ppo2.0.py:34-39).

TPU-native form: the epoch/minibatch loops are ``lax.scan``s inside one jit —
no host round-trips between minibatches; policy math runs in log-space from
logits.  When the batch is sharded over a device mesh, XLA inserts the
gradient all-reduce (psum over ICI) automatically from the sharding
annotations — the NCCL role in a torch DDP setup (the reference has no
distributed path at all, SURVEY.md §2.3).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct
from flax.training.train_state import TrainState

from tpu_plume.core.config import PPOConfig


@struct.dataclass
class PPOBatch:
    """Flattened rollout data (reference PPOBuffer.get, PPOV1.1/model.py:100-116)."""

    obs: jnp.ndarray            # f32[B, obs_dim]
    actions: jnp.ndarray        # i32[B]
    old_log_probs: jnp.ndarray  # f32[B]
    advantages: jnp.ndarray     # f32[B] (normalized)
    returns: jnp.ndarray        # f32[B]
    old_values: jnp.ndarray     # f32[B]
    # Optional privileged-teacher labels for distilled PPO (i32[B]; None
    # disables the auxiliary imitation term — pytree-stable empty subtree).
    oracle_actions: Any = None
    # Optional per-sample weights for the policy surrogate + entropy
    # (f32[B]; None = uniform).  Guided fine-tuning sets 0 on steps the
    # terminal guide overrode: the executed action was not the policy's,
    # so the importance ratio is meaningless there — the value loss still
    # trains on every step (the critic must price guided dynamics).
    weights: Any = None


def normalize_advantages(advantages: jnp.ndarray, cfg: PPOConfig) -> jnp.ndarray:
    """Global advantage normalization with the reference's degenerate-std
    guard (PPOV2.0/train_ppo2.0.py:34-39)."""
    centered = advantages - advantages.mean()
    std = centered.std()
    std = jnp.where((std < 1e-6) | jnp.isnan(std), 1.0, std)
    return centered / (std + cfg.adv_norm_eps)


def _maybe_distill(total, metrics, oracle_actions, log_probs_all, obs, cfg):
    """Distilled PPO: on-policy DAgger term — the privileged teacher labeled
    every rollout state on device, so this cross-entropy is imitation
    WITHOUT distribution shift, composed with the RL loss.  No-op when the
    batch carries no labels.

    ``distill_conc_gate`` > 0 weights the imitation to states whose
    normalized concentration (obs[..., 2]) exceeds the gate: in the far
    field the teacher acts on privileged direction knowledge the obs
    cannot carry, and imitating there only pushes base-rate mimicry."""
    if oracle_actions is None:
        return total, metrics
    star_oh = jax.nn.one_hot(
        oracle_actions, log_probs_all.shape[-1], dtype=log_probs_all.dtype
    )
    ce = -jnp.sum(log_probs_all * star_oh, axis=-1)
    if cfg.distill_conc_gate > 0.0:
        w = (obs[..., 2] > cfg.distill_conc_gate).astype(ce.dtype)
        distill = (ce * w).sum() / jnp.maximum(w.sum(), 1.0)
    else:
        distill = ce.mean()
    total = total + cfg.distill_coef * distill
    metrics = {**metrics, "loss/total": total, "loss/distill": distill}
    return total, metrics


def ppo_loss(params, apply_fn, batch: PPOBatch, cfg: PPOConfig):
    logits, values = apply_fn(params, batch.obs)
    log_probs_all = jax.nn.log_softmax(logits)
    # one-hot contraction instead of take_along_axis: no gather in the
    # forward and no scatter in the backward (TPU gathers are the enemy).
    action_oh = jax.nn.one_hot(batch.actions, logits.shape[-1], dtype=logits.dtype)
    new_log_probs = jnp.sum(log_probs_all * action_oh, axis=-1)

    # Clipped policy surrogate (train_ppo2.0.py:67-71).
    ratio = jnp.exp(new_log_probs - batch.old_log_probs)
    surr1 = ratio * batch.advantages
    surr2 = jnp.clip(ratio, 1.0 - cfg.clip_epsilon, 1.0 + cfg.clip_epsilon) * batch.advantages
    surr = jnp.minimum(surr1, surr2)
    if batch.weights is not None:
        wsum = jnp.maximum(batch.weights.sum(), 1.0)
        policy_loss = -(surr * batch.weights).sum() / wsum
    else:
        policy_loss = -jnp.mean(surr)

    # Clipped value loss vs stored values (train_ppo2.0.py:73-78).
    value_clipped = batch.old_values + jnp.clip(
        values - batch.old_values, -cfg.clip_epsilon, cfg.clip_epsilon
    )
    value_loss = cfg.value_loss_coef * jnp.mean(
        jnp.maximum(
            (values - batch.returns) ** 2,
            (value_clipped - batch.returns) ** 2,
        )
    )

    # Entropy bonus (train_ppo2.0.py:80-81).
    probs = jnp.exp(log_probs_all)
    ent = -jnp.sum(probs * log_probs_all, axis=-1)
    if batch.weights is not None:
        entropy = (ent * batch.weights).sum() / jnp.maximum(
            batch.weights.sum(), 1.0)
    else:
        entropy = ent.mean()

    total = policy_loss + value_loss - cfg.entropy_beta * entropy
    metrics = {
        "loss/total": total,
        "loss/policy": policy_loss,
        "loss/value": value_loss,
        "loss/entropy": entropy,
        "loss/approx_kl": jnp.mean(batch.old_log_probs - new_log_probs),
        "loss/clip_frac": jnp.mean(
            (jnp.abs(ratio - 1.0) > cfg.clip_epsilon).astype(jnp.float32)
        ),
    }
    total, metrics = _maybe_distill(
        total, metrics, batch.oracle_actions, log_probs_all, batch.obs, cfg
    )
    return total, metrics


@struct.dataclass
class RecurrentPPOBatch:
    """Sequence-major rollout data for the recurrent (LSTM) policy.

    Unlike ``PPOBatch`` the time axis survives: the update replays the
    policy's hidden state over each chunk (BPTT) from the stored chunk-start
    carry ``h_init``, zeroing it where ``resets`` (episode auto-reset at the
    previous step).  Stored-state replay across epochs is the standard
    recurrent-PPO approximation (the carry goes slightly stale as params
    move within the update; chunk lengths here are <=128 steps)."""

    obs: jnp.ndarray            # f32[T, N, obs_dim]
    actions: jnp.ndarray        # i32[T, N]
    old_log_probs: jnp.ndarray  # f32[T, N]
    advantages: jnp.ndarray     # f32[T, N] (normalized)
    returns: jnp.ndarray        # f32[T, N]
    old_values: jnp.ndarray     # f32[T, N]
    resets: jnp.ndarray         # bool[T, N] — zero hidden before step t
    h_init: Any                 # (c, h) each f32[N, H] at chunk start
    # Optional privileged-teacher labels (i32[T, N]; see PPOBatch).
    oracle_actions: Any = None


def ppo_loss_recurrent(params, apply_fn, batch: RecurrentPPOBatch, cfg: PPOConfig):
    """Same clipped-surrogate losses as ``ppo_loss`` but over a [T, n]
    sequence minibatch with hidden-state replay."""
    _, logits, values = apply_fn(
        params, batch.h_init, batch.obs, batch.resets, method="sequence"
    )
    log_probs_all = jax.nn.log_softmax(logits)
    action_oh = jax.nn.one_hot(batch.actions, logits.shape[-1], dtype=logits.dtype)
    new_log_probs = jnp.sum(log_probs_all * action_oh, axis=-1)

    ratio = jnp.exp(new_log_probs - batch.old_log_probs)
    surr1 = ratio * batch.advantages
    surr2 = jnp.clip(ratio, 1.0 - cfg.clip_epsilon, 1.0 + cfg.clip_epsilon) * batch.advantages
    policy_loss = -jnp.mean(jnp.minimum(surr1, surr2))

    value_clipped = batch.old_values + jnp.clip(
        values - batch.old_values, -cfg.clip_epsilon, cfg.clip_epsilon
    )
    value_loss = cfg.value_loss_coef * jnp.mean(
        jnp.maximum(
            (values - batch.returns) ** 2,
            (value_clipped - batch.returns) ** 2,
        )
    )

    probs = jnp.exp(log_probs_all)
    entropy = -jnp.sum(probs * log_probs_all, axis=-1).mean()

    total = policy_loss + value_loss - cfg.entropy_beta * entropy
    metrics = {
        "loss/total": total,
        "loss/policy": policy_loss,
        "loss/value": value_loss,
        "loss/entropy": entropy,
        "loss/approx_kl": jnp.mean(batch.old_log_probs - new_log_probs),
        "loss/clip_frac": jnp.mean(
            (jnp.abs(ratio - 1.0) > cfg.clip_epsilon).astype(jnp.float32)
        ),
    }
    total, metrics = _maybe_distill(
        total, metrics, batch.oracle_actions, log_probs_all, batch.obs, cfg
    )
    return total, metrics


def ppo_update_recurrent(
    train_state: TrainState,
    batch: RecurrentPPOBatch,
    key: jax.Array,
    cfg: PPOConfig,
) -> tuple[TrainState, dict[str, Any]]:
    """Recurrent-policy PPO update: minibatches are slices of the ENV axis
    (whole sequences stay contiguous for BPTT), shuffled per epoch by a
    random env permutation — an N-element gather, negligible next to the
    flat path's B-element one.

    ``cfg.minibatch_size`` still counts steps: each minibatch holds
    ``minibatch_size // T`` complete env sequences."""
    T, N = batch.actions.shape
    envs_per_mb = max(1, cfg.minibatch_size // T)
    num_minibatches = max(1, N // envs_per_mb)
    envs_per_mb = N // num_minibatches
    assert num_minibatches * envs_per_mb == N, (
        f"num_envs {N} not divisible into {num_minibatches} minibatches"
    )

    grad_fn = jax.grad(ppo_loss_recurrent, has_aux=True)

    def minibatch_step(ts: TrainState, mb: RecurrentPPOBatch):
        grads, metrics = grad_fn(ts.params, ts.apply_fn, mb, cfg)
        return ts.apply_gradients(grads=grads), metrics

    _TIME_MAJOR_FIELDS = (
        "obs", "actions", "old_log_probs", "advantages",
        "returns", "old_values", "resets",
    ) + (("oracle_actions",) if batch.oracle_actions is not None else ())

    def epoch_step(ts: TrainState, epoch_key: jax.Array):
        perm = jax.random.permutation(epoch_key, N)

        def split_time_major(x):
            # [T, N, ...] -> [M, T, n, ...]
            s = x[:, perm].reshape(T, num_minibatches, envs_per_mb, *x.shape[2:])
            return jnp.moveaxis(s, 1, 0)

        def split_env_major(x):
            # [N, ...] -> [M, n, ...]
            return x[perm].reshape(num_minibatches, envs_per_mb, *x.shape[1:])

        # Dispatch by FIELD, not by array shape: h_init leaves are [N, H]
        # and a shape test misclassifies them whenever T == N and H == N
        # (e.g. envs 128, unroll 128, lstm_hidden 128), permuting hidden
        # units instead of envs.
        shuffled = batch.replace(
            h_init=jax.tree.map(split_env_major, batch.h_init),
            **{f: split_time_major(getattr(batch, f)) for f in _TIME_MAJOR_FIELDS},
        )
        ts, metrics = jax.lax.scan(minibatch_step, ts, shuffled)
        return ts, jax.tree.map(jnp.mean, metrics)

    epoch_keys = jax.random.split(key, cfg.epochs)
    train_state, metrics = jax.lax.scan(epoch_step, train_state, epoch_keys)
    return train_state, jax.tree.map(jnp.mean, metrics)


def ppo_update(
    train_state: TrainState,
    batch: PPOBatch,
    key: jax.Array,
    cfg: PPOConfig,
) -> tuple[TrainState, dict[str, Any]]:
    """cfg.epochs epochs of shuffled minibatch SGD, fully on device.

    The batch size must be a multiple of ``cfg.minibatch_size`` (rollout
    geometry guarantees this; the reference silently drops ragged tails via
    ``indices.split``, train_ppo2.0.py:44-46).
    """
    batch_size = batch.obs.shape[0]
    num_minibatches = batch_size // cfg.minibatch_size
    assert num_minibatches * cfg.minibatch_size == batch_size, (
        f"batch {batch_size} not divisible by minibatch {cfg.minibatch_size}"
    )

    loss_fn = ppo_loss
    if cfg.remat:
        # recompute the loss forward during the backward instead of
        # storing trunk activations across it (see PPOConfig.remat)
        loss_fn = jax.checkpoint(ppo_loss, static_argnums=(1, 3))
    grad_fn = jax.grad(loss_fn, has_aux=True)
    if (cfg.fused_update and batch.oracle_actions is None
            and batch.weights is None):
        # VMEM-resident fused fwd+bwd (ops/pallas_ppo.py); None when the
        # param tree is not the standard feedforward ActorCritic.
        from tpu_plume.ops.pallas_ppo import make_grad_fn

        fused = make_grad_fn(train_state.params, cfg, cfg.minibatch_size)
        if fused is not None:
            grad_fn = fused

    def minibatch_step(ts: TrainState, mb: PPOBatch):
        grads, metrics = grad_fn(ts.params, ts.apply_fn, mb, cfg)
        return ts.apply_gradients(grads=grads), metrics

    affine = cfg.shuffle_mode == "affine" and (batch_size & (batch_size - 1)) == 0

    def epoch_step(ts: TrainState, epoch_key: jax.Array):
        if cfg.shuffle_mode == "roll":
            # Random circular rotation: zero gather cost (contiguous copy).
            # The flat batch is T-major (adjacent elements are different
            # envs), so every minibatch spans all envs at a random time
            # offset — empirically equivalent for PPO and ~2x faster than a
            # 500k-row random gather on TPU (see bench notes in RESULTS.md).
            offset = jax.random.randint(epoch_key, (), 0, batch_size)
            shuffled = jax.tree.map(
                lambda x: jnp.roll(x, offset, axis=0).reshape(
                    num_minibatches, cfg.minibatch_size, *x.shape[1:]
                ),
                batch,
            )
            ts, metrics = jax.lax.scan(minibatch_step, ts, shuffled)
            return ts, jax.tree.map(jnp.mean, metrics)
        if affine:
            # O(1) random affine bijection i -> (a*i + b) mod B (B power of
            # two, a odd => bijective).  Avoids the O(B log B) sort that
            # jax.random.permutation costs on TPU every epoch.
            k_a, k_b = jax.random.split(epoch_key)
            a = (
                jax.random.randint(k_a, (), 0, batch_size // 2, dtype=jnp.uint32)
                * 2
                + 1
            )
            b = jax.random.randint(k_b, (), 0, batch_size, dtype=jnp.uint32)
            idx = jax.lax.broadcasted_iota(jnp.uint32, (batch_size, 1), 0)[:, 0]
            perm = ((a * idx + b) & jnp.uint32(batch_size - 1)).astype(jnp.int32)
        else:
            perm = jax.random.permutation(epoch_key, batch_size)
        shuffled = jax.tree.map(
            lambda x: x[perm].reshape(
                num_minibatches, cfg.minibatch_size, *x.shape[1:]
            ),
            batch,
        )
        ts, metrics = jax.lax.scan(minibatch_step, ts, shuffled)
        return ts, jax.tree.map(jnp.mean, metrics)

    epoch_keys = jax.random.split(key, cfg.epochs)
    train_state, metrics = jax.lax.scan(epoch_step, train_state, epoch_keys)
    return train_state, jax.tree.map(jnp.mean, metrics)
