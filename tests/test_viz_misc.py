"""Viz plots, ragged conc CSV, and V1.2 sequence-LSTM pipeline tests."""

import numpy as np

from tpu_plume.data.conc_csv import load_conc_rows, save_conc_rows


def test_conc_csv_roundtrip(tmp_path):
    p = str(tmp_path / "data.csv")
    seqs = [np.arange(5, dtype=np.float32), np.arange(3, dtype=np.float32) * 2]
    save_conc_rows(p, seqs, [99.0, 88.0])
    save_conc_rows(p, [np.ones(2, np.float32)], [77.0], append=True)
    out_seqs, out_src = load_conc_rows(p)
    assert len(out_seqs) == 3
    np.testing.assert_allclose(out_seqs[0], seqs[0])
    np.testing.assert_allclose(out_seqs[1], seqs[1])
    np.testing.assert_allclose(out_src, [99.0, 88.0, 77.0])


def test_train_sequence_lstm_v12(tmp_path):
    from tpu_plume.train.lstm_trainer import train_sequence_lstm

    rng = np.random.default_rng(0)
    seqs, srcs = [], []
    for _ in range(60):
        length = int(rng.integers(8, 25))
        src = float(rng.uniform(40, 100))
        seqs.append((src * np.linspace(0, 1, length) + rng.normal(0, 0.5, length)).astype(np.float32))
        srcs.append(src)
    res = train_sequence_lstm(seqs, srcs, str(tmp_path), epochs=40, lr=5e-3)
    assert res.losses[-1] < res.losses[0]
    assert "test_r2" in res.extra
    assert (tmp_path / "lstm_v12").exists()
    assert (tmp_path / "scaler_params_v12.npy").exists()


def _make_nc(tmp_path):
    from tpu_plume.data import NetCDFWriter

    path = str(tmp_path / "t.nc")
    w = NetCDFWriter(path, grid_size=500, max_episodes=3, max_steps=30,
                     with_gaussian_params=True)
    rng = np.random.RandomState(0)
    for ep in range(2):
        steps = 20
        x = np.linspace(10, 300, steps).astype(np.float32)
        y = np.linspace(20, 280, steps).astype(np.float32)
        conc = rng.rand(steps).astype(np.float32) * 90
        w.write_episode_data(ep, steps, x, y, conc, float(x[-1]), float(y[-1]),
                             95.0, sigma=15.0, peak=100.0)
    w.close()
    return path


def test_plot_gaussian_field(tmp_path):
    from tpu_plume.viz import plot_gaussian_field

    nc = _make_nc(tmp_path)
    out = plot_gaussian_field(nc, 0, stop_pos=(150, 150),
                              save_path=str(tmp_path / "field.png"))
    assert (tmp_path / "field.png").stat().st_size > 10_000


def test_plot_training_curves(tmp_path):
    import pandas as pd

    from tpu_plume.viz import plot_training_curves

    df = pd.DataFrame({
        "Episode": np.arange(1, 201),
        "Total_Reward": np.random.rand(200) * 100,
        "Success": (np.random.rand(200) > 0.5).astype(int),
        "Steps": np.random.randint(10, 1000, 200),
        "Current_Radius": np.linspace(50, 5, 200),
    })
    p = str(tmp_path / "res.csv")
    df.to_csv(p, index=False)
    plot_training_curves(p, save_path=str(tmp_path / "curves.png"))
    assert (tmp_path / "curves.png").stat().st_size > 10_000


def test_training_dashboard(tmp_path):
    from tpu_plume.viz import training_dashboard

    field = np.random.rand(100, 100).astype(np.float32)
    traj = np.cumsum(np.random.randn(50, 2), axis=0) + 50
    training_dashboard(
        np.random.rand(300) * 50, field, traj, (60, 60), 25.0,
        save_path=str(tmp_path / "dash.png"),
    )
    assert (tmp_path / "dash.png").stat().st_size > 10_000


def test_trainer_conc_csv_capture(tmp_path):
    from tpu_plume.core.config import (
        CurriculumConfig, EnvConfig, PPOConfig, RolloutConfig, TrainConfig,
    )
    from tpu_plume.train import train_ppo

    cfg = TrainConfig(
        name="ppo_v1_2",
        env=EnvConfig(max_steps=40, plume_sigma=500 / 16),
        ppo=PPOConfig(minibatch_size=128, epochs=2),
        curriculum=CurriculumConfig(window_size=16),
        rollout=RolloutConfig(num_envs=32, unroll_length=32),
        total_episodes=40,
    )
    out = str(tmp_path / "run")
    train_ppo(cfg, out, capture_conc_csv=True, verbose=False, write_csv=False)
    seqs, srcs = load_conc_rows(f"{out}/data.csv")
    assert len(seqs) > 0
    assert all(len(s) >= 1 for s in seqs)
    # source conc recorded for successful episodes is the final-cell conc
    assert np.all(srcs >= 0)
