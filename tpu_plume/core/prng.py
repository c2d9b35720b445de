"""Stateless procedural randomness for field evaluation.

The reference materializes a fresh 500x500 random turbulence field per
episode reset (PPOV1.1/environment.py:51-62) and then only ever reads it at
single integer cells (environment.py:64-80, 98-111).  On TPU that O(grid^2)
host allocation per reset would dominate; instead we make the turbulence a
pure function of ``(field_seed, ix, iy)`` via an integer hash, so concentration
and TKE are evaluated analytically at the query cell in O(1), fully fused
into the jitted env step, and identical in distribution to the reference.

The hash is a counter-based 32-bit finalizer (xxhash/murmur-style avalanche)
— cheap VPU integer ops, Pallas-friendly, and statistically validated in
``tests/test_prng.py``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# numpy scalars (not device arrays) so these inline as literals everywhere,
# including inside Pallas kernels.
_M1 = np.uint32(0x7FEB352D)
_M2 = np.uint32(0x846CA68B)
_C1 = np.uint32(0x9E3779B9)
_C2 = np.uint32(0x85EBCA6B)
_C3 = np.uint32(0xC2B2AE35)

_TWO_PI = 6.283185307179586
_INV_2_24 = 1.0 / (1 << 24)


def _avalanche(h: jnp.ndarray) -> jnp.ndarray:
    """Full-avalanche 32-bit mix (lowbias32 variant)."""
    h = h ^ (h >> 16)
    h = h * _M1
    h = h ^ (h >> 15)
    h = h * _M2
    h = h ^ (h >> 16)
    return h


def hash_cell(seed: jnp.ndarray, ix: jnp.ndarray, iy: jnp.ndarray, salt: int) -> jnp.ndarray:
    """Hash (seed, ix, iy, salt) -> uint32 bits. Broadcasts over inputs."""
    seed = seed.astype(jnp.uint32)
    h = seed ^ (ix.astype(jnp.uint32) * _C1) ^ (iy.astype(jnp.uint32) * _C2)
    h = h ^ (jnp.uint32(salt) * _C3)
    h = _avalanche(h)
    # Second round, re-salted with the seed, to decorrelate structured inputs.
    return _avalanche(h + seed)


def bits_to_uniform(bits: jnp.ndarray) -> jnp.ndarray:
    """uint32 -> float32 uniform in [0, 1) using the top 24 bits.

    The shifted value fits in 24 bits, so bitcasting to int32 preserves it —
    needed because Mosaic (TPU Pallas) has no uint32->float32 cast."""
    shifted = bits >> jnp.uint32(8)
    as_int = jax.lax.bitcast_convert_type(shifted, jnp.int32)
    return as_int.astype(jnp.float32) * jnp.float32(_INV_2_24)


def cell_uniform(seed, ix, iy, salt: int) -> jnp.ndarray:
    return bits_to_uniform(hash_cell(seed, ix, iy, salt))


def cell_normal(seed, ix, iy, salt: int) -> jnp.ndarray:
    """Standard normal via Box-Muller from two independent uniforms."""
    u1 = cell_uniform(seed, ix, iy, salt)
    u2 = cell_uniform(seed, ix, iy, salt + 1)
    u1 = jnp.maximum(u1, jnp.float32(1e-7))
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    return r * jnp.cos(_TWO_PI * u2)
