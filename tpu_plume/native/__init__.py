"""Native (C++) host-runtime kernels, with automatic build + NumPy fallback.

``get_drain()`` returns the compiled ``scatter_chunk`` or None; callers fall
back to the pure-NumPy implementation (tpu_plume/train/ppo_trainer.py).
"""

from __future__ import annotations

_drain_fn = None
_tried = False


def get_drain():
    global _drain_fn, _tried
    if _tried:
        return _drain_fn
    _tried = True
    try:
        from tpu_plume.native import _drain  # type: ignore
    except ImportError:
        from tpu_plume.native.build import build

        if build() is None:
            return None
        try:
            from tpu_plume.native import _drain  # type: ignore
        except ImportError:
            return None
    _drain_fn = _drain.scatter_chunk
    return _drain_fn
