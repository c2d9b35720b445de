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


def test_drain_window_rows_matches_full_drain():
    """Device-side episode-row compaction must yield exactly the rows (and
    flat (iter, t, n) order) the lossless full-mask drain produces."""
    from tpu_plume.train.hostsync import drain_window_rows

    rng = np.random.default_rng(0)
    T, N, W = 4, 6, 3
    keys = ("done", "steps", "total_reward")
    entries = []
    for i in range(W):
        done = rng.random((T, N)) < 0.3
        rec = {
            "done": jnp.asarray(done),
            "steps": jnp.asarray(rng.integers(1, 500, (T, N)), jnp.int32),
            "total_reward": jnp.asarray(rng.normal(size=(T, N)), jnp.float32),
        }
        entries.append(({"loss": jnp.float32(i)}, rec))

    cap = 64
    host_stats, rows, count = drain_window_rows(entries, keys, cap)
    assert [float(s["loss"]) for s in host_stats] == [0.0, 1.0, 2.0]

    # reference: flatten each window entry in order, take done rows
    exp_steps, exp_rew = [], []
    for _, rec in entries:
        mask = np.asarray(rec["done"]).reshape(-1)
        exp_steps.append(np.asarray(rec["steps"]).reshape(-1)[mask])
        exp_rew.append(np.asarray(rec["total_reward"]).reshape(-1)[mask])
    exp_steps = np.concatenate(exp_steps)
    exp_rew = np.concatenate(exp_rew)

    assert count == len(exp_steps) <= cap
    np.testing.assert_array_equal(rows["steps"][:count].astype(np.int32), exp_steps)
    np.testing.assert_allclose(rows["total_reward"][:count], exp_rew, rtol=1e-6)


def test_drain_window_rows_overflow_reports_true_count():
    from tpu_plume.train.hostsync import drain_window_rows

    T, N = 4, 8
    rec = {
        "done": jnp.ones((T, N), bool),
        "steps": jnp.arange(T * N, dtype=jnp.int32).reshape(T, N),
        "total_reward": jnp.zeros((T, N), jnp.float32),
    }
    _, rows, count = drain_window_rows(
        [({"loss": jnp.float32(0)}, rec)], ("done", "steps", "total_reward"), 8
    )
    assert count == T * N  # true count, caller must fall back
    np.testing.assert_array_equal(rows["steps"].astype(np.int32), np.arange(8))
