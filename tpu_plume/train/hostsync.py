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


# --- episode-row compaction -------------------------------------------------
#
# A record-producing PPO window carries ~11 per-step [T, N] fields whose only
# consumer is the episode CSV — a handful of rows where done is True.  Moving
# the full masks costs ~1.4 MB/iter through the tunnel (~26 ms/iter: a 4x
# slowdown of the whole trainer, measured at 512 envs x 64 unroll on the 3-D
# bank).  Compact ON DEVICE instead: one masked gather at a fixed row cap,
# fused into the same packed-stats call, so a window moves ~cap rows
# (~160 KB) in the same single transfer.

from functools import partial


@partial(jax.jit, static_argnames=("cap",))
def _pack_rows(stats_flats, dones, fields, cap):
    stats = jnp.concatenate(
        [x.astype(jnp.float32).ravel() for fl in stats_flats for x in fl]
    )
    done = jnp.concatenate([d.ravel() for d in dones]) > 0
    count = done.sum().astype(jnp.float32)
    idx = jnp.nonzero(done, size=cap, fill_value=0)[0]
    mat = jnp.stack(
        [
            jnp.concatenate([f.astype(jnp.float32).ravel() for f in fs])
            for fs in fields
        ]
    )
    rows = mat[:, idx]  # [F, cap]
    return jnp.concatenate([stats, count[None], rows.ravel()])


def drain_window_rows(
    entries: list, rec_keys: tuple, cap: int
) -> tuple[list, dict, int]:
    """Drain a window of (stats, record) pairs with device-side episode-row
    compaction: ONE jitted pack + ONE transfer moves every stats pytree plus
    the <= ``cap`` record rows where ``done`` is set (flat (iter, t, n) scan
    order — identical to draining each [T, N] mask in sequence).

    Returns ``(host_stats, rows, count)`` where ``rows`` maps each non-done
    key in ``rec_keys`` to a [cap] f32 array whose first ``min(count, cap)``
    entries are valid.  ``count`` is the TRUE number of done rows in the
    window; if it exceeds ``cap`` the caller must re-drain the full masks
    (``drain_window``) to keep the CSV lossless.
    """
    stats_list = [e[0] for e in entries]
    recs = [e[1] for e in entries]
    flat0, treedef = jax.tree.flatten(stats_list[0])
    shapes = [(leaf.shape, np.dtype(leaf.dtype)) for leaf in flat0]
    sizes = [int(np.prod(s)) for s, _ in shapes]
    field_keys = [k for k in rec_keys if k != "done"]
    buf = np.asarray(
        _pack_rows(
            [jax.tree.flatten(s)[0] for s in stats_list],
            [r["done"] for r in recs],
            [[r[k] for r in recs] for k in field_keys],
            cap,
        )
    )
    host_stats, off = [], 0
    for _ in entries:
        leaves = []
        for (shape, dtype), n in zip(shapes, sizes):
            leaves.append(
                buf[off:off + n].reshape(shape).astype(dtype, copy=False)
            )
            off += n
        host_stats.append(jax.tree.unflatten(treedef, leaves))
    count = int(buf[off])
    off += 1
    rows = {}
    for k in field_keys:
        rows[k] = buf[off:off + cap]
        off += cap
    return host_stats, rows, count
