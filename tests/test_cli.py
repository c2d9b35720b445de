"""CLI smoke tests."""

import json
import os

import numpy as np

from tpu_plume.cli.main import main


def test_cli_inspect_nc(tmp_path, capsys):
    from tpu_plume.data import NetCDFWriter

    path = str(tmp_path / "t.nc")
    w = NetCDFWriter(path, grid_size=500, max_episodes=4, max_steps=10)
    w.write_episode_data(0, 5, np.ones(5), np.ones(5), np.ones(5), 1.0, 2.0, 99.0)
    w.close()
    main(["inspect-nc", path])
    out = capsys.readouterr().out
    assert "episode: 4" in out and "Methane concentration" in out


def test_cli_train_and_eval(tmp_path, capsys):
    out_dir = str(tmp_path / "run")
    main([
        "train", "--preset", "ppo_v2_0", "--out", out_dir,
        "--envs", "8", "--unroll", "16", "--minibatch", "64",
        "--iterations", "2", "--episodes", "100000", "--depth-coef", "50",
    ])
    payload = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert payload["env_steps"] == 2 * 8 * 16
    assert os.path.isdir(os.path.join(out_dir, "checkpoint"))

    main([
        "eval", "--preset", "ppo_v2_0", "--ckpt", os.path.join(out_dir, "checkpoint"),
        "--episodes", "8", "--stop", "heuristic", "--out", str(tmp_path / "res"),
    ])
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "success_rate" in summary and "early_stop_rate" in summary
    assert os.path.exists(tmp_path / "res" / "validation_metrics.npz")

    # .pth round-trip through the CLI eval path
    main([
        "eval", "--preset", "ppo_v2_0",
        "--pth", os.path.join(out_dir, "model", "ppo_successful_models.pth"),
        "--episodes", "4",
    ])
    summary2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "mean_deviation" in summary2

    # terminal-guidance eval path (--guide fit)
    main([
        "eval", "--preset", "ppo_v2_0",
        "--ckpt", os.path.join(out_dir, "checkpoint"),
        "--episodes", "4", "--guide", "fit",
    ])
    summary3 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "success_rate" in summary3


def test_cli_expert(tmp_path, capsys):
    out_dir = str(tmp_path / "run")
    main([
        "train", "--preset", "ppo_v2_0", "--out", out_dir,
        "--envs", "8", "--unroll", "8", "--minibatch", "32", "--iterations", "1",
        "--episodes", "100000",
    ])
    capsys.readouterr()
    expert = str(tmp_path / "expert_data.npz")
    main([
        "expert", "--preset", "ppo_v2_0", "--ckpt", os.path.join(out_dir, "checkpoint"),
        "--episodes", "3", "--out", expert,
    ])
    payload = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert payload["samples"] > 0 and os.path.exists(expert)


def test_cli_train_gail(tmp_path, capsys):
    out_dir = str(tmp_path / "run")
    main([
        "train", "--preset", "ppo_v1_1", "--out", out_dir,
        "--envs", "8", "--unroll", "8", "--minibatch", "32", "--iterations", "1",
        "--episodes", "100000",
    ])
    capsys.readouterr()
    expert = str(tmp_path / "expert_data.npz")
    main([
        "expert", "--preset", "ppo_v1_1", "--ckpt", os.path.join(out_dir, "checkpoint"),
        "--episodes", "3", "--out", expert,
    ])
    capsys.readouterr()
    main([
        "train-gail", "--preset", "ppo_v1_1", "--expert", expert,
        "--out", str(tmp_path / "gail"), "--closed-loop", "--gail-coef", "0.2",
        "--envs", "8", "--unroll", "8", "--minibatch", "32", "--iterations", "2",
        "--episodes", "100000",
    ])
    payload = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "episodes" in payload
    assert os.path.isdir(os.path.join(tmp_path, "gail", "checkpoint"))


def test_cli_train_lstm_and_plot(tmp_path, capsys):
    from tpu_plume.data import NetCDFWriter

    nc = str(tmp_path / "training_data.nc")
    rng = np.random.default_rng(0)
    w = NetCDFWriter(nc, grid_size=500, max_episodes=8, max_steps=40)
    for ep in range(8):
        n = int(rng.integers(25, 40))
        conc = np.linspace(5, 90, n) + rng.normal(0, 1, n)
        w.write_episode_data(
            ep, n, rng.uniform(0, 499, n), rng.uniform(0, 499, n),
            conc, 250.0, 250.0, float(conc.max()),
        )
    w.close()

    main(["train-lstm", "--variant", "threshold", "--nc", nc,
          "--out", str(tmp_path / "lstm"), "--epochs", "2"])
    payload = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert np.isfinite(payload["final_loss"])

    main(["train-lstm", "--variant", "peakstop", "--nc", nc,
          "--out", str(tmp_path / "ps"), "--epochs", "2"])
    payload = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert np.isfinite(payload["best_loss"])

    # plot: field PNG from the NC + curves from a training CSV
    png = str(tmp_path / "field.png")
    main(["plot", "--what", "field", "--nc", nc, "--episode", "0", "--out", png])
    payload = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert os.path.exists(payload["saved"])


def test_cli_gridded_bank_train(tmp_path, capsys):
    out_dir = str(tmp_path / "grun")
    main([
        "train", "--preset", "ppo_v2_0", "--plume-model", "gridded",
        "--synth-bank", "time", "--bank-fields", "2", "--bank-frames", "3",
        "--bank-spf", "8",
        "--out", out_dir, "--envs", "8", "--unroll", "8", "--minibatch", "32",
        "--iterations", "1", "--episodes", "100000",
    ])
    payload = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert payload["env_steps"] == 64


def test_cli_bank_without_gridded_model_rejected(tmp_path):
    """A bank flag on a non-gridded env must fail LOUDLY: it would be
    silently ignored and the run would train on the preset's procedural
    physics instead (costs a full training run before the eval-time
    --guide bank error surfaces it)."""
    import pytest

    with pytest.raises(SystemExit, match="plume-model gridded"):
        main([
            "train", "--preset", "wrf_les", "--synth-bank", "static",
            "--bank-fields", "2", "--out", str(tmp_path / "r"),
            "--envs", "8", "--unroll", "8", "--minibatch", "32",
            "--iterations", "1",
        ])


def test_cli_distilled_train_and_oracle_expert(tmp_path, capsys):
    """--distill wires the teacher into the fused step; expert --oracle
    collects teacher demonstrations without a checkpoint."""
    out_dir = str(tmp_path / "run")
    main([
        "train", "--preset", "ppo_v2_0", "--out", out_dir,
        "--obs-memory", "--distill", "phase", "--distill-coef", "0.5",
        "--distill-gate", "0.02",
        "--envs", "8", "--unroll", "16", "--minibatch", "64",
        "--iterations", "2", "--episodes", "100000", "--no-csv",
    ])
    payload = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert payload["env_steps"] == 2 * 8 * 16

    npz = str(tmp_path / "oracle.npz")
    main([
        "expert", "--preset", "ppo_v2_0", "--oracle", "phase",
        "--obs-memory", "--episodes", "6", "--out", npz,
    ])
    payload = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert payload["samples"] > 0 and os.path.exists(npz)

    bc_dir = str(tmp_path / "bc")
    main([
        "train-bc", "--preset", "ppo_v2_0", "--obs-memory",
        "--expert", npz, "--bc-epochs", "4", "--out", bc_dir,
    ])
    payload = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert 0.0 <= payload["val_accuracy"] <= 1.0
    assert os.path.isdir(os.path.join(bc_dir, "checkpoint"))


def test_cli_eval_oracle_ceiling(tmp_path, capsys):
    """eval --oracle runs the scripted teacher through the standard
    harness — the fast protocol-ceiling measurement (phase oracle ~85%)."""
    main([
        "eval", "--preset", "ppo_v2_0", "--oracle", "phase",
        "--episodes", "64",
    ])
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["success_rate"] >= 0.6
    assert summary["mean_steps"] < 200


def test_cli_wrf_aniso_guide_eval(tmp_path, capsys):
    """--guide fit on the anisotropic preset dispatches to the Gauss-Newton
    model fit (evaluation/aniso_fit.py) through the CLI, incl. the
    --guide-max-se gate override."""
    out_dir = str(tmp_path / "run")
    main([
        "train", "--preset", "wrf_les", "--out", out_dir,
        "--envs", "8", "--unroll", "16", "--minibatch", "64",
        "--iterations", "1", "--episodes", "100000",
    ])
    capsys.readouterr()
    main([
        "eval", "--preset", "wrf_les",
        "--ckpt", os.path.join(out_dir, "checkpoint"),
        "--episodes", "4", "--guide", "fit", "--guide-max-se", "6",
    ])
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "success_rate" in summary and "mean_deviation" in summary
