"""The LSTM stop-predictor family ("dynamic stop" capability).

Reference model zoo (SURVEY.md §2.5):

===============================  ==========================  =========================================
Model                            input                       reference
===============================  ==========================  =========================================
LSTMModel                        padded conc sequence        PPOV1.2/new.LSTM.py:49-81
ConcentrationThresholdPredictor  last-10 scaled conc window  PPOV2.0/model.py:203-240
ConcentrationPredictor           (B, T, 6)                   PPOV2.1/model.py:260-276
GaussianLSTM                     conc sequence               PPOV2.1/model.py:281-303
GaussianParamPredictor           (B, T, 6)                   PPOV2.1/model.py:308-322
GaussianParamAndStopPredictor    conc sequence               PPOV2.1/model.py:327-346
PeakAndStopPredictor             last-20 conc window / 100   PPOV2.1/train_lstm.py:84-100
===============================  ==========================  =========================================

TPU-native design: each model is a flax module whose recurrence runs as a
``lax.scan`` BPTT (``nn.RNN`` over ``nn.OptimizedLSTMCell`` — the fused 4-gate
matmul formulation that XLA tiles onto the MXU).  Variable-length sequences
use ``seq_lengths`` masking instead of torch's pack/pad machinery; the final
carry at ``t = length`` replaces the reference's "gather last unpacked
output" indexing (PPOV2.0/model.py:236-240).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

_xavier = nn.initializers.xavier_uniform()


def _lstm_last_hidden(
    x: jnp.ndarray,
    hidden_size: int,
    lengths: Optional[jnp.ndarray],
    *,
    name: str | None = None,
) -> jnp.ndarray:
    """Run one LSTM layer and return the hidden state at the last valid step."""
    rnn = nn.RNN(nn.OptimizedLSTMCell(features=hidden_size), name=name)
    carry, _ = rnn(x, seq_lengths=lengths, return_carry=True)
    return carry[1]  # (c, h) -> h


class LSTMModel(nn.Module):
    """V1.2 prototype: predict source concentration from a (padded) episode
    concentration sequence (PPOV1.2/new.LSTM.py:49-81)."""

    hidden_size: int = 64
    num_layers: int = 2
    output_size: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, lengths: Optional[jnp.ndarray] = None):
        if x.ndim == 2:
            x = x[..., None]
        h = None
        for i in range(self.num_layers):
            rnn = nn.RNN(nn.OptimizedLSTMCell(features=self.hidden_size), name=f"lstm_{i}")
            carry, x = rnn(x, seq_lengths=lengths, return_carry=True)
            h = carry[1]
        out = nn.Dense(self.output_size, kernel_init=_xavier)(h)
        return jnp.squeeze(out, -1)


class ConcentrationThresholdPredictor(nn.Module):
    """V2.0 dynamic stop-threshold net: 3-layer LSTM(128, dropout .3) + MLP
    head on the last valid output (PPOV2.0/model.py:203-240)."""

    hidden_size: int = 128
    num_layers: int = 3
    dropout: float = 0.3
    head_dropout: float = 0.1

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        lengths: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        if x.ndim == 2:
            x = x[..., None]
        h = None
        for i in range(self.num_layers):
            rnn = nn.RNN(nn.OptimizedLSTMCell(features=self.hidden_size), name=f"lstm_{i}")
            carry, ys = rnn(x, seq_lengths=lengths, return_carry=True)
            h = carry[1]
            x = ys
            if i < self.num_layers - 1:
                # torch nn.LSTM applies dropout between layers (not after the
                # last), PPOV2.0/model.py:206-212.
                x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        y = nn.Dense(64, kernel_init=_xavier)(h)
        # torch LayerNorm eps (the flax default 1e-6 costs ~7e-4 relative
        # drift vs the reference module — measured in the .pth parity test).
        y = nn.LayerNorm(epsilon=1e-5)(y)
        y = nn.relu(y)
        y = nn.Dropout(self.head_dropout, deterministic=deterministic)(y)
        y = nn.Dense(1, kernel_init=_xavier)(y)
        return jnp.squeeze(y, -1)


class ConcentrationPredictor(nn.Module):
    """V2.1 stop-probability head on a 6-dim observation sequence
    (PPOV2.1/model.py:260-276)."""

    hidden_size: int = 32

    @nn.compact
    def __call__(self, x: jnp.ndarray, lengths: Optional[jnp.ndarray] = None):
        if x.ndim == 2:
            x = x[:, None, :]
        h = _lstm_last_hidden(x, self.hidden_size, lengths)
        y = nn.Dense(16, kernel_init=_xavier)(h)
        y = nn.relu(y)
        y = nn.Dense(1, kernel_init=_xavier)(y)
        return nn.sigmoid(jnp.squeeze(y, -1))


class GaussianLSTM(nn.Module):
    """V2.1 Gaussian-field regressor -> (mu_x, mu_y, sigma, peak)
    (PPOV2.1/model.py:281-303)."""

    hidden_size: int = 64

    @nn.compact
    def __call__(self, x: jnp.ndarray, lengths: Optional[jnp.ndarray] = None):
        if x.ndim == 2:
            x = x[..., None]
        h = _lstm_last_hidden(x, self.hidden_size, lengths)
        mu = nn.Dense(2, kernel_init=_xavier, name="mu_head")(h)
        s = nn.Dense(16, kernel_init=_xavier)(h)
        s = nn.relu(s)
        sigma = nn.softplus(nn.Dense(1, kernel_init=_xavier)(s))
        peak = nn.relu(nn.Dense(1, kernel_init=_xavier, name="peak_head")(h))
        return jnp.concatenate([mu, sigma, peak], axis=-1)


class GaussianParamPredictor(nn.Module):
    """V2.1 (mu_x, mu_y, sigma, peak) from 6-dim obs windows
    (PPOV2.1/model.py:308-322)."""

    hidden_size: int = 32

    @nn.compact
    def __call__(self, x: jnp.ndarray, lengths: Optional[jnp.ndarray] = None):
        if x.ndim == 2:
            x = x[:, None, :]
        h = _lstm_last_hidden(x, self.hidden_size, lengths)
        # head width follows the cell (32 reproduces the reference layout)
        y = nn.Dense(self.hidden_size, kernel_init=_xavier)(h)
        y = nn.relu(y)
        return nn.Dense(4, kernel_init=_xavier)(y)


class GaussianParamAndStopPredictor(nn.Module):
    """V2.1 joint (sigma, peak, stop_prob) head (PPOV2.1/model.py:327-346)."""

    hidden_size: int = 32

    @nn.compact
    def __call__(self, x: jnp.ndarray, lengths: Optional[jnp.ndarray] = None):
        if x.ndim == 2:
            x = x[..., None]
        h = _lstm_last_hidden(x, self.hidden_size, lengths)
        sigma = jnp.squeeze(nn.Dense(1, kernel_init=_xavier, name="fc_sigma")(h), -1)
        peak = jnp.squeeze(nn.Dense(1, kernel_init=_xavier, name="fc_peak")(h), -1)
        stop = nn.sigmoid(jnp.squeeze(nn.Dense(1, kernel_init=_xavier, name="fc_stop")(h), -1))
        return sigma, peak, stop


class PeakAndStopPredictor(nn.Module):
    """V2.1 joint peak+stop gate — the variant actually trained and wired
    into evaluation (PPOV2.1/train_lstm.py:84-100,
    PPOV2.1/evaluate_with_lstm.py:11-27)."""

    hidden_size: int = 32

    @nn.compact
    def __call__(self, x: jnp.ndarray, lengths: Optional[jnp.ndarray] = None):
        if x.ndim == 2:
            x = x[..., None]
        h = _lstm_last_hidden(x, self.hidden_size, lengths)
        peak = jnp.squeeze(nn.Dense(1, kernel_init=_xavier, name="fc_peak")(h), -1)
        stop = nn.sigmoid(jnp.squeeze(nn.Dense(1, kernel_init=_xavier, name="fc_stop")(h), -1))
        return peak, stop
