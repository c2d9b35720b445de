"""PPO actor-critic network.

Reference: ``PPOActorCritic`` (PPOV1.1/model.py:17-53, PPOV2.1/model.py:16-46)
— a 6->256->128 MLP trunk with LayerNorm+ReLU, a 5-way softmax actor head and
a scalar critic head, orthogonal init (gain sqrt(2) trunk / 0.01 actor / 1.0
critic, zero biases).

TPU-native deviations: the module returns *logits* (policy math downstream
runs in log-space via ``log_softmax`` — numerically stabler than the
reference's probs+log and removes the need for its NaN tripwire,
model.py:47-49), and the batched forward is a pair of MXU matmuls across all
parallel envs rather than a per-step (1, 6) host round-trip.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn


class ActorCritic(nn.Module):
    num_actions: int = 5
    hidden_sizes: Sequence[int] = (256, 128)
    dtype: jnp.dtype = jnp.float32
    # Terminal-precision escape hatch for mixed-precision training: compute
    # the actor/critic HEADS (and their LayerNorm'd input) in this dtype
    # while the trunk stays ``dtype``.  The heads are 128->5 and 128->1 —
    # negligible FLOPs — but their precision bounds how finely the value
    # surface can distinguish near-terminal states (the bf16-update split's
    # one measured regression is the radius-5 bullseye, RESULTS.md
    # mixed-precision section).  None = same as ``dtype``.
    head_dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        for h in self.hidden_sizes:
            x = nn.Dense(
                h,
                kernel_init=nn.initializers.orthogonal(jnp.sqrt(2.0)),
                bias_init=nn.initializers.zeros,
                dtype=self.dtype,
            )(x)
            x = nn.LayerNorm(dtype=self.dtype)(x)
            x = nn.relu(x)
        hd = self.dtype if self.head_dtype is None else self.head_dtype
        x = x.astype(hd)
        logits = nn.Dense(
            self.num_actions,
            kernel_init=nn.initializers.orthogonal(0.01),
            bias_init=nn.initializers.zeros,
            dtype=hd,
        )(x)
        value = nn.Dense(
            1,
            kernel_init=nn.initializers.orthogonal(1.0),
            bias_init=nn.initializers.zeros,
            dtype=hd,
        )(x)
        return logits.astype(jnp.float32), jnp.squeeze(value, -1).astype(jnp.float32)
