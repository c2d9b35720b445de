"""GAIL discriminator.

Reference: ``Discriminator`` (PPOV1.1/model.py:58-70): (state || one-hot
action) -> 128 -> 1 with a final Sigmoid, trained with ``BCELoss``
(model.py:169-188).  Here the module returns the *logit* and the loss uses
the numerically-stable sigmoid-BCE formulation; ``prob`` is exposed for the
reward-augmentation path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class Discriminator(nn.Module):
    hidden: int = 128

    @nn.compact
    def __call__(self, state: jnp.ndarray, action_one_hot: jnp.ndarray):
        x = jnp.concatenate([state, action_one_hot], axis=-1)
        x = nn.Dense(self.hidden)(x)
        x = nn.relu(x)
        logit = nn.Dense(1)(x)
        return jnp.squeeze(logit, -1)


def bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Stable binary cross-entropy on logits (== BCELoss(sigmoid(x), t))."""
    return jnp.mean(
        jnp.maximum(logits, 0.0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def discriminator_loss(
    apply_fn,
    params,
    expert_states: jnp.ndarray,
    expert_actions_oh: jnp.ndarray,
    policy_states: jnp.ndarray,
    policy_actions_oh: jnp.ndarray,
) -> jnp.ndarray:
    """Reference ``compute_discriminator_loss`` (PPOV1.1/model.py:169-188):
    expert labeled 1, policy labeled 0, summed BCE."""
    expert_logits = apply_fn(params, expert_states, expert_actions_oh)
    policy_logits = apply_fn(params, policy_states, policy_actions_oh)
    return bce_with_logits(expert_logits, jnp.ones_like(expert_logits)) + bce_with_logits(
        policy_logits, jnp.zeros_like(policy_logits)
    )


def gail_reward(apply_fn, params, states: jnp.ndarray, actions_oh: jnp.ndarray) -> jnp.ndarray:
    """Imitation reward r = -log(1 - D(s,a)).

    The reference trains its discriminator but never feeds it back into the
    PPO reward (SURVEY.md §3.2 — the loop is open).  This closes the loop
    (enabled behind a flag in the GAIL trainer).
    """
    logits = apply_fn(params, states, actions_oh)
    # -log(1 - sigmoid(x)) = softplus(x)
    return jax.nn.softplus(logits)
