"""drain_window: packed single-transfer round trip preserves structure,
shapes, and dtypes (bool / int32 / float32)."""

import jax
import jax.numpy as jnp
import numpy as np

from tpu_plume.train.hostsync import drain_window


def test_drain_window_roundtrip():
    entries = []
    for i in range(5):
        entries.append(
            {
                "stats": {"loss": jnp.float32(0.5 + i), "count": jnp.int32(900 + i)},
                "rec": (
                    jnp.arange(6, dtype=jnp.int32).reshape(2, 3) + i,
                    (jnp.arange(4) % 2 == 0).reshape(2, 2),
                    jnp.linspace(0.0, 1.0, 3, dtype=jnp.float32) * (i + 1),
                ),
            }
        )
    host = drain_window(entries)
    assert len(host) == 5
    for i, h in enumerate(host):
        assert isinstance(h["stats"]["loss"], np.ndarray)
        assert h["stats"]["count"].dtype == np.int32
        assert int(h["stats"]["count"]) == 900 + i
        a, b, c = h["rec"]
        assert a.dtype == np.int32 and a.shape == (2, 3)
        np.testing.assert_array_equal(a, np.arange(6).reshape(2, 3) + i)
        assert b.dtype == bool
        np.testing.assert_array_equal(b, (np.arange(4) % 2 == 0).reshape(2, 2))
        np.testing.assert_allclose(c, np.linspace(0, 1, 3) * (i + 1), rtol=1e-6)


def test_drain_window_with_none_leaves():
    entries = [(jnp.float32(i), None) for i in range(3)]
    host = drain_window(entries)
    assert [h[1] for h in host] == [None, None, None]
    assert [float(h[0]) for h in host] == [0.0, 1.0, 2.0]
