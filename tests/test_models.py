"""Network shape/init/masking tests (tpu_plume.models)."""

import jax
import jax.numpy as jnp
import numpy as np

from tpu_plume.models import (
    ActorCritic,
    ConcentrationPredictor,
    ConcentrationThresholdPredictor,
    Discriminator,
    GaussianLSTM,
    GaussianParamAndStopPredictor,
    GaussianParamPredictor,
    LSTMModel,
    PeakAndStopPredictor,
)
from tpu_plume.models.discriminator import bce_with_logits


def test_actor_critic_shapes_and_init():
    model = ActorCritic()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((4, 6)))
    logits, value = model.apply(params, jnp.ones((4, 6)))
    assert logits.shape == (4, 5) and value.shape == (4,)
    # 0.01-gain actor head -> near-uniform initial policy (reference
    # PPOV1.1/model.py:37 "small gain avoids large initial logits")
    probs = np.asarray(jax.nn.softmax(logits))
    assert np.all(np.abs(probs - 0.2) < 0.05)
    # trunk kernels orthogonal with gain sqrt(2): W^T W = 2 I
    w = np.asarray(params["params"]["Dense_1"]["kernel"])  # 256 -> 128
    gram = w.T @ w
    np.testing.assert_allclose(gram, 2.0 * np.eye(128), atol=1e-4)


def test_discriminator_and_bce():
    model = Discriminator()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((3, 6)), jnp.zeros((3, 5)))
    logit = model.apply(params, jnp.ones((3, 6)), jnp.eye(5)[:3])
    assert logit.shape == (3,)
    # stable BCE equals naive formula away from saturation
    x = jnp.array([-2.0, 0.0, 3.0])
    t = jnp.array([0.0, 1.0, 1.0])
    naive = -np.mean(
        np.asarray(t) * np.log(jax.nn.sigmoid(x)) + (1 - np.asarray(t)) * np.log(1 - jax.nn.sigmoid(x))
    )
    np.testing.assert_allclose(float(bce_with_logits(x, t)), naive, rtol=1e-4)


def _check_lstm(model, x, expect_shapes, lengths=None):
    params = model.init(jax.random.PRNGKey(0), x, lengths)
    out = model.apply(params, x, lengths)
    flat = out if isinstance(out, tuple) else (out,)
    for o, s in zip(flat, expect_shapes):
        assert o.shape == s, (o.shape, s)
    return params, out


def test_lstm_zoo_shapes():
    b, t = 4, 10
    _check_lstm(LSTMModel(), jnp.ones((b, t)), [(b,)])
    _check_lstm(ConcentrationThresholdPredictor(), jnp.ones((b, t)), [(b,)])
    _check_lstm(ConcentrationPredictor(), jnp.ones((b, t, 6)), [(b,)])
    _check_lstm(GaussianLSTM(), jnp.ones((b, t)), [(b, 4)])
    _check_lstm(GaussianParamPredictor(), jnp.ones((b, t, 6)), [(b, 4)])
    _check_lstm(GaussianParamAndStopPredictor(), jnp.ones((b, t)), [(b,), (b,), (b,)])
    params, (peak, stop) = _check_lstm(PeakAndStopPredictor(), jnp.ones((b, t)), [(b,), (b,)])
    assert np.all((np.asarray(stop) >= 0) & (np.asarray(stop) <= 1))


def test_lstm_seq_lengths_mask_padding():
    """Padding beyond the stated length must not affect the output —
    replaces torch pack_padded_sequence semantics (PPOV2.0/model.py:229-240)."""
    b, t = 3, 12
    model = ConcentrationThresholdPredictor()
    x = jax.random.normal(jax.random.PRNGKey(1), (b, t))
    lengths = jnp.array([5, 12, 8])
    params = model.init(jax.random.PRNGKey(0), x, lengths)
    out1 = model.apply(params, x, lengths)
    corrupted = x.at[0, 5:].set(999.0).at[2, 8:].set(-999.0)
    out2 = model.apply(params, corrupted, lengths)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)


def test_threshold_predictor_dropout_modes():
    model = ConcentrationThresholdPredictor()
    x = jnp.ones((2, 10))
    params = model.init(jax.random.PRNGKey(0), x)
    d1 = model.apply(params, x, deterministic=True)
    d2 = model.apply(params, x, deterministic=True)
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
    s1 = model.apply(params, x, deterministic=False, rngs={"dropout": jax.random.PRNGKey(1)})
    s2 = model.apply(params, x, deterministic=False, rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(s1), np.asarray(s2))


def test_seq_bc_fitter_learns_memory_task():
    """make_seq_bc_fitter must solve a task REQUIRING memory: label[t] is
    the input class from 2 steps earlier (delayed echo) — impossible for a
    memoryless map, ~100% for correct BPTT."""
    import numpy as np

    from tpu_plume.models.recurrent import RecurrentActorCritic
    from tpu_plume.train.bc import make_seq_bc_fitter

    T, N, D = 40, 256, 6
    rng = np.random.default_rng(0)
    cls = rng.integers(0, 5, (T, N))
    obs = np.zeros((T, N, D), np.float32)
    for c in range(5):
        obs[..., :5][cls == c, c] = 1.0
    labels = np.roll(cls, 2, axis=0)
    labels[:2] = 0
    mask = np.ones((T, N), bool)
    mask[:2] = False

    model = RecurrentActorCritic(
        num_actions=5, embed_size=32, lstm_hidden=32, layer_norm_cell=True
    )
    params = model.init(
        jax.random.PRNGKey(0), model.initial_state(2), jnp.zeros((2, D))
    )
    fit = make_seq_bc_fitter(model, epochs=30, batch_episodes=64, lr=3e-3)
    params, losses, _, va = fit(
        params,
        jnp.asarray(obs), jnp.asarray(labels, jnp.int32), jnp.asarray(mask),
        jnp.asarray(obs[:, :32]), jnp.asarray(labels[:, :32], jnp.int32),
        jnp.asarray(mask[:, :32]),
        jax.random.PRNGKey(1),
    )
    assert float(va) > 0.9
