"""Windowed host<->device sync for the tunneled single-chip backend.

On this backend every eager op dispatch AND every device->host transfer
costs a full ~25-30 ms round trip regardless of size (CLAUDE.md).  The
drain therefore packs an entire window of result pytrees into ONE flat
f32 device array with ONE jitted call, moves it in ONE transfer, and
splits it back on the host.  f32 packing is lossless for the payloads
used here: bools and int32 counters < 2^24 are exactly representable.

Measured effects: the per-field `np.asarray` drain (~14 transfers/iter)
made record-producing PPO runs 20x slower than `--no-csv` ones; the GAIL
trainer's eager per-entry `jnp.stack` chains (~20 dispatches/iter) cost
~0.6-2 s/iteration against a ~45 ms device step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_pack = jax.jit(
    lambda flats: jnp.concatenate(
        [x.astype(jnp.float32).ravel() for fl in flats for x in fl]
    )
)


def drain_window(entries: list) -> list:
    """Transfer a window of same-structure pytrees of device arrays to the
    host in one packed round trip; returns host pytrees with the original
    shapes and dtypes restored."""
    flat0, treedef = jax.tree.flatten(entries[0])
    shapes = [(leaf.shape, np.dtype(leaf.dtype)) for leaf in flat0]
    sizes = [int(np.prod(s)) for s, _ in shapes]
    buf = np.asarray(_pack([jax.tree.flatten(e)[0] for e in entries]))
    out, off = [], 0
    for _ in entries:
        leaves = []
        for (shape, dtype), n in zip(shapes, sizes):
            leaves.append(
                buf[off:off + n].reshape(shape).astype(dtype, copy=False)
            )
            off += n
        out.append(jax.tree.unflatten(treedef, leaves))
    return out
