"""Checkpoint / resume.

The reference only ever saves final ``state_dict``s (PPOV2.0/train_ppo2.0.py:
254-256) — no optimizer state, PRNG, or episode counter, so no true resume
exists (SURVEY.md §5).  Here the full training bundle (params + optimizer
state + curriculum state + PRNG key + counters) round-trips through Orbax,
and the reference's ``.pth`` artifact names are supported as a torch-format
export for interop (see tpu_plume.data.torch_export).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np


def _to_numpy_tree(tree: Any):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, tree: Any) -> None:
    """Save a pytree bundle to ``path`` (directory) via Orbax."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, _to_numpy_tree(tree), force=True)
    ckptr.wait_until_finished()


def restore_checkpoint(path: str, target: Any | None = None) -> Any:
    """Restore a bundle with guaranteed dtypes/shapes.

    ``target`` (a matching pytree of arrays) supplies the abstract template
    explicitly; without one, the template is built from the checkpoint's own
    saved metadata (shape + dtype per leaf) — a typed restore either way, no
    raw-dict UNSAFE fallback."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if target is None:
        item_meta = ckptr.metadata(path).item_metadata
        if item_meta is None or getattr(item_meta, "tree", None) is None:
            raise FileNotFoundError(
                f"no readable checkpoint at {path}: Orbax metadata is "
                "missing or incomplete (the saving run may have crashed "
                "before its first save, or the path is wrong)"
            )
        meta = item_meta.tree
        abstract = jax.tree.map(
            lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype),
            meta,
            is_leaf=lambda m: hasattr(m, "dtype") and hasattr(m, "shape"),
        )
    else:
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype),
            target,
        )
    return ckptr.restore(path, abstract)
