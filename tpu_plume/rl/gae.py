"""Generalized Advantage Estimation as a reverse ``lax.scan``.

Reference: the Python reverse loop in ``_update_model``
(PPOV2.0/train_ppo2.0.py:18-31, PPOV1.1/train_ppo1.0.py:66-83) with
gamma=0.99, lambda=0.95.

TPU-native form: time-major [T, N] arrays, one reverse scan shared across all
N envs — O(T) sequential VPU work instead of an O(T) Python loop per 256-step
buffer.

Correctness note (SURVEY.md §7 "known reference bugs"): the reference masks
``values[t+1]`` with ``dones[t+1]`` and bootstraps the buffer end with
``values[t] * (1 - dones[t])`` — both leak value estimates across episode
boundaries.  Here ``dones[t]`` marks that the transition at ``t`` ended the
episode, so the next value (whether ``values[t+1]`` or the bootstrap) is
masked by ``1 - dones[t]``, the standard-correct form.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def compute_gae(
    rewards: jnp.ndarray,      # f32[T, N]
    values: jnp.ndarray,       # f32[T, N] V(s_t)
    dones: jnp.ndarray,        # bool/f32[T, N] transition t terminal
    bootstrap_value: jnp.ndarray,  # f32[N] V(s_{T}) of the carried obs
    gamma: float,
    lam: float,
):
    """Returns (advantages, returns), both f32[T, N]."""
    dones = dones.astype(jnp.float32)

    def body(carry, x):
        next_adv, next_value = carry
        reward, value, done = x
        nonterminal = 1.0 - done
        delta = reward + gamma * next_value * nonterminal - value
        adv = delta + gamma * lam * nonterminal * next_adv
        return (adv, value), adv

    (_, _), advantages = jax.lax.scan(
        body,
        (jnp.zeros_like(bootstrap_value), bootstrap_value),
        (rewards, values, dones),
        reverse=True,
    )
    returns = advantages + values
    return advantages, returns
