"""Native C++ episode-drain tests: build, correctness vs the NumPy path."""

import numpy as np
import pytest

from tpu_plume.native import get_drain
from tpu_plume.train.ppo_trainer import EpisodeAssembler


def _chunk(T, N, seed=0):
    """Random but consistent chunk: per-env episode step counters with dones."""
    rng = np.random.RandomState(seed)
    steps = np.zeros((T, N), np.int32)
    done = np.zeros((T, N), bool)
    counters = np.ones(N, np.int32)
    for t in range(T):
        for n in range(N):
            steps[t, n] = counters[n]
            if rng.rand() < 0.15 and counters[n] >= 2:
                done[t, n] = True
                counters[n] = 1
            else:
                counters[n] += 1
    pos = rng.rand(T, N, 2).astype(np.float32) * 100
    conc = rng.rand(T, N).astype(np.float32) * 50
    rec = {"success": done.copy(), "radius": np.full((T, N), 50.0, np.float32)}
    return {"pos": pos, "conc": conc, "done": done, "steps": steps, "episode": rec}


def test_native_builds():
    assert get_drain() is not None, "native drain failed to build (g++ present?)"


def test_native_matches_numpy_assembler():
    T, N, M = 40, 8, 64
    chunks = [_chunk(T, N, seed=s) for s in range(3)]

    a_native = EpisodeAssembler(N, M)
    a_numpy = EpisodeAssembler(N, M)
    a_numpy._native = None
    assert a_native._native is not None

    for ch in chunks:
        out_n = list(a_native.drain(ch))
        out_p = list(a_numpy.drain(ch))
        assert len(out_n) == len(out_p) > 0
        for en, ep in zip(out_n, out_p):
            assert en["env"] == ep["env"] and en["steps"] == ep["steps"]
            for k in ("x", "y", "conc"):
                np.testing.assert_array_equal(en[k], ep[k])
            np.testing.assert_array_equal(en["success"], ep["success"])


def test_native_drain_speed():
    """Native drain should beat the Python loop comfortably at scale."""
    import time

    T, N, M = 128, 1024, 256
    ch = _chunk(T, N, seed=1)
    a_native = EpisodeAssembler(N, M)
    a_numpy = EpisodeAssembler(N, M)
    a_numpy._native = None
    if a_native._native is None:
        pytest.skip("no native drain")

    t0 = time.perf_counter()
    n_out = len(list(a_native.drain(ch)))
    dt_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    p_out = len(list(a_numpy.drain(ch)))
    dt_numpy = time.perf_counter() - t0
    assert n_out == p_out
    # informational only — absolute timings are load-dependent in CI
    print(f"native drain {dt_native * 1e3:.1f} ms vs numpy {dt_numpy * 1e3:.1f} ms")
