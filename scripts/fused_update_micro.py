"""Provenance for the fused-Pallas-update negative result (RESULTS.md
"Fused-train-step perf study"): times the 40-chain flagship update with
autodiff vs the ops/pallas_ppo.py kernel, f32 and bf16.

Usage: python scripts/fused_update_micro.py [auto-f32] [fused-f32] [fused-bf16]
"""
import sys, time; sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import os
os.environ["JAX_COMPILATION_CACHE_DIR"] = os.path.expanduser("~/.cache/tpu_plume_jax")
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
import functools
from tpu_plume.core.config import PPOConfig
from tpu_plume.models import ActorCritic
from tpu_plume.rl.ppo import PPOBatch, ppo_loss
from tpu_plume.ops import pallas_ppo
from flax.training.train_state import TrainState
import optax

N, T = 4096, 128
B = N * T
MB = B // 8
model = ActorCritic(num_actions=5)
key = jax.random.PRNGKey(0)
params = model.init(key, jnp.zeros((1, 6)))
ts = TrainState.create(apply_fn=model.apply, params=params,
                       tx=optax.chain(optax.clip_by_global_norm(0.5), optax.adam(3e-5)))

def make_batch(k):
    ks = jax.random.split(k, 6)
    return PPOBatch(
        obs=jax.random.normal(ks[0], (B, 6)),
        actions=jax.random.randint(ks[1], (B,), 0, 5),
        old_log_probs=-1.6 + 0.1 * jax.random.normal(ks[2], (B,)),
        advantages=jax.random.normal(ks[3], (B,)),
        returns=jax.random.normal(ks[4], (B,)),
        old_values=jax.random.normal(ks[5], (B,)),
    )
batch = make_batch(jax.random.PRNGKey(1))

def run(tag, grad_kind, bf16):
    cfg = PPOConfig(minibatch_size=MB, epochs=5, bf16_compute=bf16)
    if grad_kind == "auto":
        gf = jax.grad(ppo_loss, has_aux=True)
        grad_fn = lambda p, mb: gf(p, model.apply, mb, cfg)
    else:
        grad_fn = lambda p, mb: pallas_ppo.fused_ppo_grads(p, mb, cfg)
    def chains(ts, batch):
        def mb_step(ts, mb):
            grads, metrics = grad_fn(ts.params, mb)
            return ts.apply_gradients(grads=grads), metrics["loss/total"]
        mbs = jax.tree.map(lambda x: x.reshape(8, MB, *x.shape[1:]), batch)
        def epoch(ts, _):
            ts, l = jax.lax.scan(mb_step, ts, mbs)
            return ts, l.mean()
        ts, l = jax.lax.scan(epoch, ts, None, length=5)
        return ts, l.mean()
    j = jax.jit(chains)
    try:
        ts2, l = j(ts, batch); _ = float(l)
    except Exception as e:
        print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
        return
    K = 24
    t0 = time.perf_counter()
    for _ in range(K):
        ts2, l = j(ts2, batch)
    _ = float(l)
    dt = (time.perf_counter() - t0) / K
    print(f"{tag}: {dt*1e3:.2f} ms per 5x8-chain update", flush=True)

import sys
arms = sys.argv[1:] or ["auto-f32", "fused-f32", "fused-bf16"]
for arm in arms:
    kind, prec = arm.rsplit("-", 1)
    run(arm, kind, prec == "bf16")
