"""Data layer tests: NetCDF schema parity, loaders, scaler, expert IO,
torch .pth interop."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_plume.data import (
    MinMaxScaler,
    NetCDFWriter,
    describe_nc,
    load_expert_data,
    load_raw_sequences,
    load_trajectory_segments,
    read_nc,
    save_expert_data,
)
from tpu_plume.data.datasets import (
    calculate_dynamic_label,
    peak_stop_dataset,
    tail_window_dataset,
)


@pytest.fixture
def nc_file(tmp_path):
    path = str(tmp_path / "training_data.nc")
    w = NetCDFWriter(path, grid_size=500, max_episodes=10, max_steps=50,
                     with_gaussian_params=True)
    rng = np.random.RandomState(0)
    for ep in range(6):
        steps = int(rng.randint(25, 50))
        x = rng.rand(steps).astype(np.float32) * 499
        y = rng.rand(steps).astype(np.float32) * 499
        conc = rng.rand(steps).astype(np.float32) * 100
        w.write_episode_data(ep, steps, x, y, conc,
                             source_x=float(x[-1]), source_y=float(y[-1]),
                             source_conc=100.0, sigma=15.0, peak=100.0)
    w.close()
    return path


def test_nc_schema_matches_reference(nc_file):
    """Schema must match PPOV2.1/nc_info.txt:1-48."""
    data = read_nc(nc_file)
    assert data["episode"].shape == (10,) and data["episode"].dtype == np.int32
    assert data["step"].shape == (50,) and data["step"].dtype == np.int32
    for name in ("x", "y", "concentration"):
        assert data[name].shape == (10, 50) and data[name].dtype == np.float32
    assert data["is_source"].shape == (10, 50) and data["is_source"].dtype == np.int8
    for name in ("source_concentration", "source_x", "source_y",
                 "gaussian_sigma", "peak_concentration"):
        assert data[name].shape == (10,) and data[name].dtype == np.float32
    assert data["__attrs__"]["GRID_SIZE"] == 500
    # unwritten episodes stay NaN-filled; is_source flags exactly one step
    assert np.isnan(data["x"][6:]).all()
    assert (data["is_source"][:6].sum(axis=1) == 1).all()
    # HDF5 attrs parity
    desc = describe_nc(nc_file)
    assert "Agent x-coordinate" in desc and "grid unit" in desc
    assert "Source peak concentration" in desc


def test_nc_is_hdf5_with_dim_scales(nc_file):
    import h5py

    with h5py.File(nc_file, "r") as f:
        assert f["x"].dims[0][0].name == "/episode"
        assert f["x"].dims[1][0].name == "/step"
        assert f["x"].compression == "gzip"
        assert np.isnan(f["x"].attrs["_FillValue"])


def test_load_raw_sequences(nc_file):
    seqs, src = load_raw_sequences(nc_file)
    assert len(seqs) == 6 and src.shape == (6,)
    assert all(25 <= len(s) <= 50 for s in seqs)
    assert np.all(src == 100.0)


def test_load_trajectory_segments_and_labels(nc_file):
    segs = load_trajectory_segments(nc_file, window_size=20)
    assert len(segs) > 0
    s = segs[0]
    assert s["positions"].shape == (20, 2)
    assert s["concentrations"].shape == (20,)
    assert s["sigma"] == 15.0
    label = calculate_dynamic_label(s)
    assert 0.01 <= label <= 0.99


def test_tail_window_dataset(nc_file):
    seqs, src = load_raw_sequences(nc_file)
    feats, targs = tail_window_dataset(seqs, src, window=10)
    assert feats.shape == (6, 10) and targs.shape == (6,)


def test_peak_stop_dataset(nc_file):
    segs = load_trajectory_segments(nc_file, window_size=20)
    feats, labels = peak_stop_dataset(segs, window_size=20)
    # one pos + one neg per episode
    assert feats.shape[0] == labels.shape[0] == 12
    assert set(np.unique(labels[:, 1])) <= {0.0, 1.0}
    # positives are the episodes' final windows ending at the source -> stop=1
    assert (labels[1::2, 1] == 1.0).all()
    # reference bug-compat mode: positive window == first window, stop ~ 0
    f2, l2 = peak_stop_dataset(segs, window_size=20, bug_compat=True)
    np.testing.assert_array_equal(f2[0], f2[1])
    assert l2[1::2, 1].max() == 0.0


def test_scaler_roundtrip(tmp_path):
    s = MinMaxScaler()
    x = np.array([2.0, 4.0, 10.0])
    out = s.fit_transform(x)
    np.testing.assert_allclose(out, [0.0, 0.25, 1.0])
    np.testing.assert_allclose(s.inverse_transform(out), x)
    p = str(tmp_path / "scaler_params.npy")
    s.save(p)
    s2 = MinMaxScaler.load(p)
    np.testing.assert_allclose(s2.transform(x), out)
    # reference 1-element format degenerates to shift-only (documented bug)
    np.save(p, np.array([2.0]))
    s3 = MinMaxScaler.load(p)
    np.testing.assert_allclose(s3.transform(x), x - 2.0)


def test_expert_io(tmp_path):
    p = str(tmp_path / "expert_data.npz")
    states = np.random.rand(7, 6).astype(np.float32)
    actions = np.arange(7) % 5
    save_expert_data(p, states, actions)
    s, a = load_expert_data(p)
    np.testing.assert_array_equal(s, states)
    np.testing.assert_array_equal(a, actions)
    assert a.dtype == np.int64


def test_torch_pth_roundtrip(tmp_path):
    """flax params -> reference-layout .pth -> flax params, and the torch
    module itself must accept the state_dict."""
    import torch

    from tpu_plume.data.torch_export import export_actor_critic_pth, import_actor_critic_pth
    from tpu_plume.models import ActorCritic

    model = ActorCritic()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 6)))
    p = str(tmp_path / "ppo_successful_models.pth")
    export_actor_critic_pth(params, p)

    # a torch replica of the reference PPOActorCritic must load it strictly
    net = torch.nn.Sequential()  # build the same structure
    feature = torch.nn.Sequential(
        torch.nn.Linear(6, 256), torch.nn.LayerNorm(256), torch.nn.ReLU(),
        torch.nn.Linear(256, 128), torch.nn.LayerNorm(128), torch.nn.ReLU(),
    )

    class Ref(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.feature = feature
            self.actor = torch.nn.Linear(128, 5)
            self.critic = torch.nn.Linear(128, 1)

        def forward(self, x):
            h = self.feature(x)
            return torch.softmax(self.actor(h), -1), self.critic(h)

    ref = Ref()
    sd = torch.load(p, weights_only=True)
    ref.load_state_dict(sd, strict=True)

    # numerical parity flax vs torch forward
    x = np.random.rand(3, 6).astype(np.float32)
    logits, value = model.apply(params, jnp.array(x))
    with torch.no_grad():
        tprobs, tvalue = ref(torch.from_numpy(x))
    np.testing.assert_allclose(
        np.asarray(jax.nn.softmax(logits)), tprobs.numpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(value), tvalue.numpy()[:, 0], rtol=1e-4, atol=1e-5)

    # import path round-trips
    re_params = import_actor_critic_pth(p)
    l2, v2 = model.apply(re_params, jnp.array(x))
    np.testing.assert_allclose(np.asarray(l2), np.asarray(logits), atol=1e-6)


def test_lstm_pth_roundtrip(tmp_path):
    """LSTM stop-predictor .pth interop: flax params -> the reference's
    state_dict layouts (PPOV2.0/train_lstm.py:98, PPOV2.1/train_lstm.py:
    122-124) load strictly into torch replicas with numerical parity, and
    import round-trips."""
    import torch

    from tpu_plume.data.torch_export import (
        export_peak_stop_pth,
        export_threshold_lstm_pth,
        import_peak_stop_pth,
        import_threshold_lstm_pth,
    )
    from tpu_plume.models.lstm_zoo import (
        ConcentrationThresholdPredictor,
        PeakAndStopPredictor,
    )

    rng = np.random.default_rng(0)

    m = ConcentrationThresholdPredictor()
    x = rng.random((3, 10, 1)).astype(np.float32)
    lengths = jnp.array([10, 10, 10])
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x), lengths)
    p = str(tmp_path / "lstm_threshold_predictor.pth")
    export_threshold_lstm_pth(params, p)

    class RefThresh(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.lstm = torch.nn.LSTM(1, 128, num_layers=3,
                                      batch_first=True, dropout=0.3)
            self.fc = torch.nn.Sequential(
                torch.nn.Linear(128, 64), torch.nn.LayerNorm(64),
                torch.nn.ReLU(), torch.nn.Dropout(0.1), torch.nn.Linear(64, 1),
            )

        def forward(self, x):
            out, _ = self.lstm(x)
            return self.fc(out[:, -1]).squeeze(-1)

    ref = RefThresh().eval()
    ref.load_state_dict(torch.load(p, weights_only=True), strict=True)
    y_flax = np.asarray(m.apply(params, jnp.asarray(x), lengths))
    with torch.no_grad():
        y_t = ref(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(y_flax, y_t, rtol=1e-4, atol=1e-5)

    re = jax.tree.map(jnp.asarray, import_threshold_lstm_pth(p))
    y2 = np.asarray(m.apply(re, jnp.asarray(x), lengths))
    np.testing.assert_allclose(y2, y_flax, atol=1e-6)

    m2 = PeakAndStopPredictor()
    x2 = rng.random((4, 20, 1)).astype(np.float32)
    params2 = m2.init(jax.random.PRNGKey(1), jnp.asarray(x2))
    p2 = str(tmp_path / "best_peak_and_stop.pth")
    export_peak_stop_pth(params2, p2)

    class RefPS(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.lstm = torch.nn.LSTM(1, 32, num_layers=1, batch_first=True)
            self.fc_peak = torch.nn.Linear(32, 1)
            self.fc_stop = torch.nn.Sequential(
                torch.nn.Linear(32, 1), torch.nn.Sigmoid()
            )

        def forward(self, x):
            _, (h_n, _) = self.lstm(x)
            h = h_n[-1]
            return self.fc_peak(h).squeeze(-1), self.fc_stop(h).squeeze(-1)

    ref2 = RefPS().eval()
    ref2.load_state_dict(torch.load(p2, weights_only=True), strict=True)
    peak_f, stop_f = m2.apply(params2, jnp.asarray(x2))
    with torch.no_grad():
        peak_t, stop_t = ref2(torch.from_numpy(x2))
    np.testing.assert_allclose(np.asarray(peak_f), peak_t.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(stop_f), stop_t.numpy(),
                               rtol=1e-4, atol=1e-5)
    re2 = jax.tree.map(jnp.asarray, import_peak_stop_pth(p2))
    pk2, _ = m2.apply(re2, jnp.asarray(x2))
    np.testing.assert_allclose(np.asarray(pk2), np.asarray(peak_f), atol=1e-6)


def test_checkpoint_roundtrip(tmp_path):
    from tpu_plume.data.checkpoint import restore_checkpoint, save_checkpoint

    tree = {"a": np.arange(5, dtype=np.float32), "b": {"c": np.float32(2.5)}}
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, tree)
    out = restore_checkpoint(path, target=tree)
    np.testing.assert_array_equal(out["a"], tree["a"])
    assert float(out["b"]["c"]) == 2.5


def test_restore_missing_checkpoint_raises_friendly_error(tmp_path):
    """Typed restore of an empty/partial checkpoint dir must raise a
    FileNotFoundError naming the path, not ``AttributeError: 'NoneType'
    object has no attribute 'tree'`` (the opaque Orbax failure mode when
    a saving run crashed before its first save)."""
    import pytest

    from tpu_plume.data.checkpoint import restore_checkpoint

    path = tmp_path / "ckpt"
    path.mkdir()
    with pytest.raises(FileNotFoundError, match="no readable checkpoint"):
        restore_checkpoint(str(path))
