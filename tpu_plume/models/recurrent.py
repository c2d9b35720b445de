"""Recurrent (LSTM) actor-critic — the PPO+LSTM *policy*.

The reference project is named UAV-WRF-LES-PPO-**LSTM**, but its LSTMs are
offline stop/peak predictors only (SURVEY.md §2.5); the policy itself is a
memoryless MLP over a 6-dim observation (PPOV1.1/model.py:17-53).  That
observation contains the *current* concentration but no history, so a
feedforward policy cannot sense the concentration gradient — it can only
learn sweep patterns, and its goal-ball crossings are chord-geometry
shallow (see RESULTS.md round-2 greedy-gap analysis).  A recurrent policy
closes that gap structurally: with memory it can compare successive
concentration readings (run-and-tumble chemotaxis) and approach the source
radially.

TPU-native form: one ``OptimizedLSTMCell`` step per env per rollout step
(fused into the rollout ``lax.scan``), and a ``sequence`` method that
replays BPTT over a stored [T, N] trajectory chunk with episode-boundary
hidden resets — used by the recurrent PPO update (rl/ppo.py
``ppo_update_recurrent``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class LayerNormLSTMCell(nn.Module):
    """LSTM cell with layer normalization on the pre-activation gates and
    the cell output — stabilizes recurrent-policy PPO training, where the
    hidden-state scale drifts as the policy sharpens (the standard
    LayerNorm-LSTM of Ba et al. 2016).  Interface-compatible with
    ``nn.OptimizedLSTMCell``."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, carry, x):
        c, h = carry
        z = (nn.Dense(4 * self.features, use_bias=False, dtype=self.dtype,
                      name="ih")(x)
             + nn.Dense(4 * self.features, use_bias=False, dtype=self.dtype,
                        kernel_init=nn.initializers.orthogonal(),
                        name="hh")(h))
        z = nn.LayerNorm(dtype=self.dtype, name="ln_gates")(z)
        i, f, g, o = jnp.split(z, 4, axis=-1)
        # +1 forget bias (the usual stabilizer; flax's cells do the same)
        new_c = nn.sigmoid(f + 1.0) * c + nn.sigmoid(i) * nn.tanh(g)
        new_h = nn.sigmoid(o) * nn.tanh(
            nn.LayerNorm(dtype=self.dtype, name="ln_cell")(new_c)
        )
        return (new_c, new_h), new_h


class RecurrentActorCritic(nn.Module):
    """Dense encoder -> LSTMCell -> (actor, critic) heads.

    Init parity with the MLP actor-critic (orthogonal sqrt(2) encoder,
    0.01 actor, 1.0 critic — PPOV1.1/model.py:31-43); the LSTM cell keeps
    flax defaults (orthogonal recurrent kernel).  ``layer_norm_cell``
    swaps in the LayerNorm-LSTM variant.
    """

    num_actions: int = 5
    embed_size: int = 128
    lstm_hidden: int = 128
    dtype: jnp.dtype = jnp.float32
    layer_norm_cell: bool = False

    def setup(self):
        self.encoder = nn.Dense(
            self.embed_size,
            kernel_init=nn.initializers.orthogonal(jnp.sqrt(2.0)),
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
        )
        self.encoder_norm = nn.LayerNorm(dtype=self.dtype)
        if self.layer_norm_cell:
            self.cell = LayerNormLSTMCell(self.lstm_hidden, dtype=self.dtype)
        else:
            self.cell = nn.OptimizedLSTMCell(self.lstm_hidden, dtype=self.dtype)
        self.actor = nn.Dense(
            self.num_actions,
            kernel_init=nn.initializers.orthogonal(0.01),
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
        )
        self.critic = nn.Dense(
            1,
            kernel_init=nn.initializers.orthogonal(1.0),
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
        )

    def initial_state(self, batch: int):
        """Zero (c, h) carry — also the episode-boundary reset value."""
        z = jnp.zeros((batch, self.lstm_hidden), jnp.float32)
        return (z, z)

    def _heads(self, y: jnp.ndarray):
        logits = self.actor(y).astype(jnp.float32)
        value = jnp.squeeze(self.critic(y), -1).astype(jnp.float32)
        return logits, value

    def step(self, carry, obs: jnp.ndarray):
        """One policy step: obs [N, D] + carry ((c, h) each [N, H]) ->
        (carry', logits [N, A], value [N])."""
        z = nn.relu(self.encoder_norm(self.encoder(obs)))
        carry, y = self.cell(carry, z)
        logits, value = self._heads(y)
        return carry, logits, value

    def __call__(self, carry, obs: jnp.ndarray):
        # flax init entry point; same as step.
        return self.step(carry, obs)

    def sequence(self, carry, obs_seq: jnp.ndarray, resets: jnp.ndarray):
        """BPTT replay over a trajectory chunk.

        obs_seq [T, N, D]; resets [T, N] bool — True where the hidden state
        must be zeroed BEFORE consuming step t (i.e. env auto-reset at
        t-1; resets[0] is False because the chunk starts from the stored
        carry).  Returns (carry', logits [T, N, A], values [T, N]).
        """
        zero = self.initial_state(obs_seq.shape[1])

        def body(c, xs):
            obs_t, reset_t = xs
            m = reset_t[:, None]
            c = jax.tree.map(lambda zz, cc: jnp.where(m, zz, cc), zero, c)
            c, logits, value = self.step(c, obs_t)
            return c, (logits, value)

        # Plain lax.scan is safe here: every submodule was created in
        # setup(), so the body only *reads* bound params (sequence is an
        # apply-time method; init goes through __call__/step).
        carry, (logits, values) = jax.lax.scan(body, carry, (obs_seq, resets))
        return carry, logits, values
