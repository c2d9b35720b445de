"""Source-localizer pipeline: NC windows -> GaussianParamPredictor
training -> post-hoc localization of flight trajectories."""

import numpy as np

from tpu_plume.data.datasets import source_window_dataset
from tpu_plume.data.netcdf import NetCDFWriter
from tpu_plume.evaluation.localize import localize_from_trajectories
from tpu_plume.train.lstm_trainer import train_source_lstm

GRID, PEAK, SIGMA = 500.0, 100.0, 500 / 16


def _write_synthetic_nc(path, episodes=80, steps=60, seed=0):
    """Flights hill-climbing toward random sources; conc from the
    isotropic model plus mild noise — enough signal for the localizer."""
    rng = np.random.default_rng(seed)
    with NetCDFWriter(path, grid_size=int(GRID), max_episodes=episodes,
                      max_steps=200) as w:
        for ep in range(episodes):
            src = rng.uniform(100, 400, 2)
            pos = rng.uniform(50, 450, 2)
            xs, ys, cs = [], [], []
            for t in range(steps):
                d = np.linalg.norm(pos - src)
                conc = PEAK * np.exp(-d**2 / (2 * SIGMA**2))
                cs.append(conc + rng.normal(0, 1.5))
                xs.append(pos[0]); ys.append(pos[1])
                step = (src - pos)
                step = 25.0 * step / (np.linalg.norm(step) + 1e-6)
                # oblique approach with jitter, stopping outside the source
                if d > 40:
                    pos = pos + step + rng.normal(0, 4, 2)
                else:
                    pos = pos + rng.normal(0, 8, 2)
            w.write_episode_data(
                episode_idx=ep, steps=steps,
                x=np.array(xs), y=np.array(ys), conc=np.array(cs),
                source_x=float(src[0]), source_y=float(src[1]),
                source_conc=PEAK,
            )


def test_source_window_dataset_shapes(tmp_path):
    nc = str(tmp_path / "data.nc")
    _write_synthetic_nc(nc, episodes=10)
    feats, lens, targets, groups = source_window_dataset(
        nc, window_size=32, per_episode=3
    )
    assert feats.shape[1:] == (32, 3) and targets.shape[1:] == (2,)
    assert len(feats) == len(lens) == len(targets) == len(groups) > 0
    # windows of one episode share a group id (leak-safe split handle)
    for g in np.unique(groups):
        assert np.all(targets[groups == g] == targets[groups == g][0])
    assert lens.min() >= 8 and lens.max() <= 32
    # normalized features in [0, ~1] (conc noise can spill slightly)
    assert feats.max() <= 1.2
    # the final (source-marker) row must NOT be in any window: the exact
    # source coordinates never appear as an input sample
    for i in range(len(feats)):
        assert not np.any(
            (np.abs(feats[i, : lens[i], 0] - targets[i, 0]) < 1e-7)
            & (np.abs(feats[i, : lens[i], 1] - targets[i, 1]) < 1e-7)
        )


def test_train_and_localize(tmp_path):
    nc = str(tmp_path / "data.nc")
    _write_synthetic_nc(nc, episodes=120)
    res = train_source_lstm(
        nc, str(tmp_path / "loc"), window=32, per_episode=8,
        epochs=250, lr=3e-3, seed=0,
    )
    # the localizer must beat the ~34.5-px chord floor on held-out windows
    assert res.extra["val_mean_err_px"] < 25.0

    # post-hoc localization on NaN-padded eval-style trajectories
    rng = np.random.default_rng(7)
    k, t = 16, 80
    trajs = np.full((k, t, 3), np.nan, np.float32)
    srcs = np.zeros((k, 2))
    for i in range(k):
        src = rng.uniform(100, 400, 2)
        srcs[i] = src
        pos = rng.uniform(50, 450, 2)
        for j in range(50):
            d = np.linalg.norm(pos - src)
            trajs[i, j] = [pos[0], pos[1],
                           PEAK * np.exp(-d**2 / (2 * SIGMA**2)) + rng.normal(0, 1.5)]
            step = 25.0 * (src - pos) / (d + 1e-6)
            pos = pos + (step if d > 40 else rng.normal(0, 8, 2)) + rng.normal(0, 4, 2)
    pred = localize_from_trajectories(trajs, res.params, window=32)
    err = np.linalg.norm(pred - srcs, axis=-1)
    assert err.mean() < 30.0


def test_train_from_flights(tmp_path):
    """The self-localization path: flights.npz (trajectories + sources)
    -> train_source_lstm(flights_path=...) -> low val error."""
    rng = np.random.default_rng(3)
    k, t = 150, 80
    trajs = np.full((k, t, 3), np.nan, np.float32)
    srcs = np.zeros((k, 2), np.float32)
    for i in range(k):
        src = rng.uniform(100, 400, 2)
        srcs[i] = src
        pos = rng.uniform(50, 450, 2)
        for j in range(60):
            d = np.linalg.norm(pos - src)
            trajs[i, j] = [pos[0], pos[1],
                           PEAK * np.exp(-d**2 / (2 * SIGMA**2)) + rng.normal(0, 1.5)]
            step = 25.0 * (src - pos) / (d + 1e-6)
            pos = pos + (step if d > 40 else rng.normal(0, 8, 2)) + rng.normal(0, 4, 2)
    fp = str(tmp_path / "flights.npz")
    np.savez_compressed(fp, trajectories=trajs, sources=srcs)
    res = train_source_lstm(
        None, str(tmp_path / "loc"), flights_path=fp,
        window=32, epochs=200, lr=3e-3, seed=0,
    )
    # threshold calibrated to the leak-free flight-level split (a
    # window-level split leaks every val flight into train and reads ~5 px
    # better than the model deserves)
    assert res.extra["val_mean_err_px"] < 35.0
