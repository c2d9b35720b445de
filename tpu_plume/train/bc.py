"""Behavior-cloning pretrainer: supervised policy fit on expert
demonstrations, used to warm-start PPO (``train --ckpt``).

The reference's imitation path is GAIL-only (PPOV1.1/train_ppo_gail.py:34-200,
discriminator never fed back); plain cross-entropy cloning is the direct
route when the expert is a privileged scripted teacher
(``evaluation.oracle.make_oracle``) — distill the part of the teacher's
policy that is inferable from the student's own observations, then let PPO
fine-tune the rest.

TPU-native shape: the whole fit is ONE jitted ``lax.scan`` over
epochs x minibatches with a device-side permutation re-drawn per epoch —
a ~100k x obs_dim table is tiny, so unlike the PPO update hot path the
random gather costs nothing here.
"""
from __future__ import annotations

import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tpu_plume.core.config import TrainConfig


@dataclass
class BCResult:
    params: dict
    train_loss: float
    val_accuracy: float
    val_loss: float
    samples: int


def make_bc_fitter(model, *, epochs: int = 30, batch_size: int = 4096,
                   lr: float = 1e-3):
    """Build a reusable jitted fit: ONE scan over epochs x minibatches
    (fresh AdamW each call).  Returned
    ``fit(params, x_tr, y_tr, x_va, y_va, key)`` gives (params, per-epoch
    losses, val_loss, val_acc); outputs stay on device — callers transfer
    once.  Build ONCE and reuse across calls (e.g. DAgger rounds): the jit
    cache is per-closure, so a fresh fitter per call recompiles every time."""
    tx = optax.adamw(lr)

    def xent(params, xb, yb):
        logits, _ = model.apply(params, xb)
        logp = jax.nn.log_softmax(logits)
        onehot = jax.nn.one_hot(yb, logits.shape[-1], dtype=logp.dtype)
        return -(onehot * logp).sum(-1).mean()

    def mb_step(carry, batch):
        params, opt_state = carry
        xb, yb = batch
        loss, grads = jax.value_and_grad(xent)(params, xb, yb)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    @jax.jit
    def fit(params, x_tr, y_tr, x_va, y_va, key):
        n_tr = x_tr.shape[0]
        bs = min(batch_size, n_tr)
        nb = max(1, n_tr // bs)
        used = nb * bs

        def epoch_step(carry, key):
            perm = jax.random.permutation(key, n_tr)[:used].reshape(nb, bs)
            carry, losses = jax.lax.scan(
                mb_step, carry, (x_tr[perm], y_tr[perm])
            )
            return carry, losses.mean()

        keys = jax.random.split(key, epochs)
        (params, _), losses = jax.lax.scan(
            epoch_step, (params, tx.init(params)), keys
        )
        logits, _ = model.apply(params, x_va)
        val_loss = xent(params, x_va, y_va)
        val_acc = (jnp.argmax(logits, -1) == y_va).mean()
        return params, losses, val_loss, val_acc

    return fit


def make_seq_bc_fitter(model, *, epochs: int = 30, batch_episodes: int = 64,
                       lr: float = 1e-3):
    """Sequence (BPTT) cross-entropy fitter for the recurrent policy.

    Data is time-major: obs [T, N, D], labels [T, N], mask [T, N] (True on
    active steps).  Each minibatch is a column slice of ``batch_episodes``
    complete episodes replayed from a zero carry (episodes start at reset,
    so no mid-sequence resets).  Same reuse contract as ``make_bc_fitter``:
    build once, call across DAgger rounds."""
    tx = optax.adamw(lr)

    def seq_xent(params, obs, labels, mask):
        b = obs.shape[1]
        h0 = (jnp.zeros((b, model.lstm_hidden)), jnp.zeros((b, model.lstm_hidden)))
        resets = jnp.zeros(obs.shape[:2], bool)
        _, logits, _ = model.apply(params, h0, obs, resets, method="sequence")
        logp = jax.nn.log_softmax(logits)
        onehot = jax.nn.one_hot(labels, logits.shape[-1], dtype=logp.dtype)
        ce = -(onehot * logp).sum(-1)
        denom = jnp.maximum(mask.sum(), 1.0)
        acc = ((jnp.argmax(logits, -1) == labels) & mask).sum() / denom
        return (ce * jnp.asarray(mask, ce.dtype)).sum() / denom, acc

    def mb_step(carry, batch):
        params, opt_state = carry
        obs, labels, mask = batch
        (loss, _), grads = jax.value_and_grad(seq_xent, has_aux=True)(
            params, obs, labels, mask
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    @jax.jit
    def fit(params, obs, labels, mask, v_obs, v_labels, v_mask, key):
        n = obs.shape[1]
        be = min(batch_episodes, n)
        nb = max(1, n // be)
        used = nb * be

        def epoch_step(carry, key):
            perm = jax.random.permutation(key, n)[:used].reshape(nb, be)
            batches = (
                jnp.moveaxis(obs[:, perm.reshape(-1)].reshape(
                    obs.shape[0], nb, be, obs.shape[-1]), 1, 0),
                jnp.moveaxis(labels[:, perm.reshape(-1)].reshape(
                    labels.shape[0], nb, be), 1, 0),
                jnp.moveaxis(mask[:, perm.reshape(-1)].reshape(
                    mask.shape[0], nb, be), 1, 0),
            )
            carry, losses = jax.lax.scan(mb_step, carry, batches)
            return carry, losses.mean()

        keys = jax.random.split(key, epochs)
        (params, _), losses = jax.lax.scan(
            epoch_step, (params, tx.init(params)), keys
        )
        val_loss, val_acc = seq_xent(params, v_obs, v_labels, v_mask)
        return params, losses, val_loss, val_acc

    return fit


def fit_bc(
    model,
    params,
    x_tr: jnp.ndarray,
    y_tr: jnp.ndarray,
    x_va: jnp.ndarray,
    y_va: jnp.ndarray,
    key: jax.Array,
    *,
    epochs: int = 30,
    batch_size: int = 4096,
    lr: float = 1e-3,
):
    """One-shot convenience wrapper around ``make_bc_fitter``."""
    fit = make_bc_fitter(model, epochs=epochs, batch_size=batch_size, lr=lr)
    return fit(params, x_tr, y_tr, x_va, y_va, key)


def train_bc(
    cfg: TrainConfig,
    out_dir: str | None,
    expert_path: str,
    *,
    epochs: int = 30,
    batch_size: int = 4096,
    lr: float = 1e-3,
    val_frac: float = 0.1,
    verbose: bool = True,
) -> BCResult:
    """Fit the policy head to expert (state, action) pairs by cross-entropy.

    Saves an Orbax bundle ``{"params": ...}`` under ``out_dir/checkpoint``
    (loadable by ``train --ckpt`` for warm starts and ``eval --ckpt``).
    The critic head is left at init — PPO re-fits it during fine-tuning.
    Recurrent archs need sequence replay, not i.i.d. pairs; rejected.
    """
    if cfg.ppo.arch == "lstm":
        raise ValueError("behavior cloning supports feedforward archs only")
    from tpu_plume.data.expert import load_expert_data
    from tpu_plume.train.ppo_trainer import make_policy_model

    states, actions = load_expert_data(expert_path)
    if states.shape[1] != cfg.env.obs_dim:
        raise ValueError(
            f"expert obs dim {states.shape[1]} != config obs dim "
            f"{cfg.env.obs_dim} (match --obs-memory etc. to the collection)"
        )
    n = states.shape[0]
    rng = np.random.default_rng(cfg.seed)
    order = rng.permutation(n)
    n_val = max(1, int(n * val_frac))
    val_idx, train_idx = order[:n_val], order[n_val:]
    x_tr = jnp.asarray(states[train_idx])
    y_tr = jnp.asarray(actions[train_idx], jnp.int32)
    x_va = jnp.asarray(states[val_idx])
    y_va = jnp.asarray(actions[val_idx], jnp.int32)

    model = make_policy_model(cfg)
    key = jax.random.PRNGKey(cfg.seed)
    params = model.init(key, x_tr[:2])
    params, losses, val_loss, val_acc = fit_bc(
        model, params, x_tr, y_tr, x_va, y_va, key,
        epochs=epochs, batch_size=batch_size, lr=lr,
    )
    # one host transfer at the end (tunnel RTT discipline)
    losses, val_loss, val_acc = jax.device_get((losses, val_loss, val_acc))
    if verbose:
        print(
            f"bc: {x_tr.shape[0]} train / {n_val} val pairs, {epochs} epochs — "
            f"loss {losses[0]:.3f} -> {losses[-1]:.3f}, "
            f"val acc {float(val_acc):.1%}"
        )
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        from tpu_plume.data.checkpoint import save_checkpoint

        save_checkpoint(
            os.path.join(out_dir, "checkpoint"),
            {"params": jax.device_get(params)},
        )
    return BCResult(
        params=params,
        train_loss=float(losses[-1]),
        val_accuracy=float(val_acc),
        val_loss=float(val_loss),
        samples=n,
    )
