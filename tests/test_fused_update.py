"""Gradient parity of the fused Pallas PPO update kernel vs
``jax.grad(ppo_loss)`` on the standard ActorCritic (interpret mode on the
CPU test mesh)."""

import jax
import jax.numpy as jnp
import numpy as np

from tpu_plume.core.config import PPOConfig
from tpu_plume.models import ActorCritic
from tpu_plume.ops.pallas_ppo import fused_ppo_grads, make_grad_fn, supports
from tpu_plume.rl.ppo import PPOBatch, ppo_loss


def _setup(b=512, d=6, a=5, seed=0):
    model = ActorCritic(num_actions=a)
    key = jax.random.PRNGKey(seed)
    params = model.init(key, jnp.zeros((1, d)))
    ks = jax.random.split(jax.random.PRNGKey(seed + 1), 6)
    batch = PPOBatch(
        obs=jax.random.normal(ks[0], (b, d)),
        actions=jax.random.randint(ks[1], (b,), 0, a),
        old_log_probs=-1.6 + 0.2 * jax.random.normal(ks[2], (b,)),
        advantages=jax.random.normal(ks[3], (b,)),
        returns=jax.random.normal(ks[4], (b,)),
        old_values=jax.random.normal(ks[5], (b,)),
    )
    return model, params, batch


def test_fused_grads_match_autodiff():
    model, params, batch = _setup()
    cfg = PPOConfig(minibatch_size=512)
    assert supports(params)
    grads_ref, metrics_ref = jax.grad(ppo_loss, has_aux=True)(
        params, model.apply, batch, cfg
    )
    grads, metrics = fused_ppo_grads(params, batch, cfg, interpret=True)
    flat_ref, tree_ref = jax.tree_util.tree_flatten(grads_ref)
    flat, tree = jax.tree_util.tree_flatten(grads)
    assert tree == tree_ref
    for gr, g in zip(flat_ref, flat):
        assert gr.shape == g.shape
        scale = np.maximum(np.abs(np.asarray(gr)).max(), 1e-8)
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(gr), rtol=0, atol=2e-5 * scale
        )
    for k in ("loss/total", "loss/policy", "loss/value", "loss/entropy",
              "loss/approx_kl", "loss/clip_frac"):
        np.testing.assert_allclose(
            float(metrics[k]), float(metrics_ref[k]), rtol=2e-5, atol=2e-6
        )


def test_fused_grads_match_autodiff_obs_memory_dims():
    """Wider obs (obs_memory layout, D=12) and a second seed."""
    model, params, batch = _setup(b=1024, d=12, seed=3)
    cfg = PPOConfig(minibatch_size=1024)
    grads_ref, _ = jax.grad(ppo_loss, has_aux=True)(
        params, model.apply, batch, cfg
    )
    grads, _ = fused_ppo_grads(params, batch, cfg, interpret=True)
    for gr, g in zip(jax.tree.leaves(grads_ref), jax.tree.leaves(grads)):
        scale = np.maximum(np.abs(np.asarray(gr)).max(), 1e-8)
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(gr), rtol=0, atol=2e-5 * scale
        )


def test_make_grad_fn_gating():
    from tpu_plume.ops.pallas_ppo import _pick_tile

    model, params, batch = _setup()
    cfg = PPOConfig(minibatch_size=512)
    # on this CPU test backend the factory always declines (autodiff path)
    assert make_grad_fn(params, cfg, 512) is None
    assert supports(params) and _pick_tile(512) > 0  # TPU would accept
    assert _pick_tile(500) == 0                      # ragged minibatch
    lstm_like = {"params": {"Dense_0": {"kernel": jnp.zeros((6, 8))}}}
    assert not supports(lstm_like)
