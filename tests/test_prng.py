"""Statistical checks on the stateless cell hash RNG (tpu_plume.core.prng)."""

import jax.numpy as jnp
import numpy as np

from tpu_plume.core import prng


def _grid_bits(seed, n=256, salt=0):
    ix = jnp.arange(n, dtype=jnp.int32)[:, None] * jnp.ones((1, n), jnp.int32)
    iy = jnp.arange(n, dtype=jnp.int32)[None, :] * jnp.ones((n, 1), jnp.int32)
    return prng.hash_cell(jnp.uint32(seed), ix, iy, salt)


def test_uniform_moments():
    u = np.asarray(prng.bits_to_uniform(_grid_bits(12345)))
    assert 0.0 <= u.min() and u.max() < 1.0
    assert abs(u.mean() - 0.5) < 5e-3
    assert abs(u.var() - 1.0 / 12.0) < 5e-3


def test_normal_moments():
    n = 256
    ix = jnp.arange(n, dtype=jnp.int32)[:, None] * jnp.ones((1, n), jnp.int32)
    iy = jnp.arange(n, dtype=jnp.int32)[None, :] * jnp.ones((n, 1), jnp.int32)
    z = np.asarray(prng.cell_normal(jnp.uint32(777), ix, iy, 0))
    assert abs(z.mean()) < 0.02
    assert abs(z.std() - 1.0) < 0.02
    # |N(0,1)| has mean sqrt(2/pi) ~ 0.7979 — the turbulence term shape.
    assert abs(np.abs(z).mean() - np.sqrt(2 / np.pi)) < 0.02


def test_seed_and_salt_decorrelation():
    a = np.asarray(prng.bits_to_uniform(_grid_bits(1, salt=0)))
    b = np.asarray(prng.bits_to_uniform(_grid_bits(1, salt=5)))
    c = np.asarray(prng.bits_to_uniform(_grid_bits(2, salt=0)))
    assert abs(np.corrcoef(a.ravel(), b.ravel())[0, 1]) < 0.02
    assert abs(np.corrcoef(a.ravel(), c.ravel())[0, 1]) < 0.02


def test_determinism():
    a = _grid_bits(42)
    b = _grid_bits(42)
    assert np.array_equal(np.asarray(a), np.asarray(b))


def test_neighbor_cells_differ():
    bits = np.asarray(_grid_bits(9, n=64))
    # no horizontal or vertical repeats
    assert (bits[1:, :] != bits[:-1, :]).mean() > 0.999
    assert (bits[:, 1:] != bits[:, :-1]).mean() > 0.999
