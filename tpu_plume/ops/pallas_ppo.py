"""Fused PPO minibatch gradient kernel: forward + hand-derived backward of
the feedforward ActorCritic in ONE Pallas kernel, activations resident in
VMEM.

Why: the PPO update is the fused train step's bottleneck (bisect, RESULTS.md
round 3: rollout 6.1 ms vs update ~25 ms at 4096 envs x 128 unroll), and the
per-chain cost is HBM-traffic-bound, not FLOP-bound — XLA materializes every
[minibatch, 256] trunk activation to HBM between the forward and backward
matmuls (~0.5 GB per chain across fwd+bwd), so 40 chains cost ~25 ms at
~800 GB/s regardless of compute dtype.  This kernel streams row tiles of the
minibatch through VMEM, runs the entire fwd+bwd chain per tile (MXU matmuls +
VPU LayerNorm/loss algebra), and accumulates the parameter gradients in VMEM
scratch — activations never touch HBM.  Per-chain traffic drops to the batch
fields themselves (~4 MB).

The backward pass is derived by hand for the fixed architecture

    obs -> Dense(H1) -> LayerNorm -> relu -> Dense(H2) -> LayerNorm -> relu
        -> {Dense(A) logits, Dense(1) value}

with the clipped-surrogate PPO loss of ``tpu_plume.rl.ppo.ppo_loss``
(policy + clipped value + entropy bonus, reference semantics
PPOV2.0/train_ppo2.0.py:15-88).  Gradient parity with ``jax.grad(ppo_loss)``
is pinned to ~1e-5 relative in tests/test_fused_update.py.

Reference counterpart: none (the reference's update is a torch autograd
minibatch loop on CPU; this is the TPU speed-of-light form of the same
math).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_plume.core.config import PPOConfig

_LN_EPS = 1e-6  # flax.linen.LayerNorm default


def _row_t(a, b):
    """a[R, M] x b[R, N] -> [M, N] (contract the row axis on the MXU)."""
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _t_right(a, b):
    """a[R, N] x b[M, N] -> [R, M] == a @ b.T without materializing b.T."""
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )


def _kernel(
    obs_ref, act_ref, oldlp_ref, adv_ref, ret_ref, oldv_ref,
    w1_ref, b1_ref, g1_ref, be1_ref,
    w2_ref, b2_ref, g2_ref, be2_ref,
    wp_ref, bp_ref, wv_ref, bv_ref,
    dw1_ref, db1_ref, dg1_ref, dbe1_ref,
    dw2_ref, db2_ref, dg2_ref, dbe2_ref,
    dwp_ref, dbp_ref, dwv_ref, dbv_ref,
    met_ref,
    *, n_total: int, num_actions: int, clip_eps: float, v_coef: float,
    ent_beta: float, mxu_dtype,
):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        for r in (dw1_ref, db1_ref, dg1_ref, dbe1_ref, dw2_ref, db2_ref,
                  dg2_ref, dbe2_ref, dwp_ref, dbp_ref, dwv_ref, dbv_ref,
                  met_ref):
            r[:] = jnp.zeros_like(r)

    x = obs_ref[:]                                  # [R, D]
    w1 = w1_ref[:]
    w2 = w2_ref[:]
    wp = wp_ref[:]
    wv = wv_ref[:]

    def mm(a, b):
        return jnp.dot(a.astype(mxu_dtype), b.astype(mxu_dtype),
                       preferred_element_type=jnp.float32)

    # ---- forward (matches ActorCritic + flax LayerNorm exactly) --------
    z1 = mm(x, w1) + b1_ref[:]                      # [R, H1]
    mu1 = jnp.mean(z1, axis=1, keepdims=True)
    var1 = jnp.mean(z1 * z1, axis=1, keepdims=True) - mu1 * mu1
    rstd1 = jax.lax.rsqrt(var1 + _LN_EPS)
    xh1 = (z1 - mu1) * rstd1
    y1 = xh1 * g1_ref[:] + be1_ref[:]
    h1 = jnp.maximum(y1, 0.0)

    z2 = mm(h1, w2) + b2_ref[:]                     # [R, H2]
    mu2 = jnp.mean(z2, axis=1, keepdims=True)
    var2 = jnp.mean(z2 * z2, axis=1, keepdims=True) - mu2 * mu2
    rstd2 = jax.lax.rsqrt(var2 + _LN_EPS)
    xh2 = (z2 - mu2) * rstd2
    y2 = xh2 * g2_ref[:] + be2_ref[:]
    h2 = jnp.maximum(y2, 0.0)

    logits = mm(h2, wp) + bp_ref[:]                 # [R, A]
    v = mm(h2, wv) + bv_ref[:]                      # [R, 1]

    # ---- loss gradients (ppo_loss, per-sample; mean -> 1/n_total) ------
    # everything per-sample stays [R, 1]: Mosaic has no cross-row
    # vector.multi_reduction to scalars, so ALL row sums below go through
    # an MXU contraction with a ones column instead
    lmax = jnp.max(logits, axis=1, keepdims=True)
    lse = jnp.log(jnp.sum(jnp.exp(logits - lmax), axis=1, keepdims=True)) + lmax
    lp = logits - lse                               # log_softmax [R, A]
    p = jnp.exp(lp)
    act = act_ref[:]                                # [R, 1] i32
    aoh = (jax.lax.broadcasted_iota(jnp.int32, lp.shape, 1) == act
           ).astype(jnp.float32)
    newlp = jnp.sum(lp * aoh, axis=1, keepdims=True)  # [R, 1]

    oldlp = oldlp_ref[:]
    adv = adv_ref[:]
    ret = ret_ref[:]
    oldv = oldv_ref[:]
    inv_n = 1.0 / float(n_total)

    ratio = jnp.exp(newlp - oldlp)
    s1 = ratio * adv
    rclip = jnp.clip(ratio, 1.0 - clip_eps, 1.0 + clip_eps)
    s2 = rclip * adv
    use1 = s1 <= s2                                 # jnp.minimum picks arg0 at ties
    inclip = (ratio > 1.0 - clip_eps) & (ratio < 1.0 + clip_eps)
    dmin_dnewlp = jnp.where(use1, ratio * adv,
                            jnp.where(inclip, ratio * adv, 0.0))
    g_newlp = -dmin_dnewlp * inv_n                  # [R, 1]

    ent = -jnp.sum(p * lp, axis=1, keepdims=True)   # [R, 1]
    dlogits = (g_newlp * (aoh - p)
               + (ent_beta * inv_n) * p * (lp + ent))

    vc = oldv + jnp.clip(v - oldv, -clip_eps, clip_eps)
    e1 = v - ret
    e2 = vc - ret
    usev1 = (e1 * e1) >= (e2 * e2)                  # jnp.maximum picks arg0 at ties
    inclip_v = (v - oldv > -clip_eps) & (v - oldv < clip_eps)
    dv = (v_coef * inv_n) * jnp.where(
        usev1, 2.0 * e1, jnp.where(inclip_v, 2.0 * e2, 0.0)
    )                                               # [R, 1]

    ones = jnp.ones((x.shape[0], 1), jnp.float32)

    def rowsum(t):  # [R, M] -> [1, M] on the MXU
        return _row_t(ones, t)

    # ---- metric sums (means taken by the caller) -----------------------
    met_cols = jnp.concatenate([
        -jnp.minimum(s1, s2),                                # policy loss
        v_coef * jnp.maximum(e1 * e1, e2 * e2),              # value loss
        ent,                                                 # entropy
        oldlp - newlp,                                       # approx_kl
        (jnp.abs(ratio - 1.0) > clip_eps).astype(jnp.float32),
        jnp.zeros_like(ent), jnp.zeros_like(ent), jnp.zeros_like(ent),
    ], axis=1)                                      # [R, 8]
    met_ref[:] = met_ref[:] + rowsum(met_cols)

    # ---- backward ------------------------------------------------------
    dh2 = _t_right(dlogits, wp) + _t_right(dv, wv)  # [R, H2]
    dwp_ref[:] = dwp_ref[:] + _row_t(h2, dlogits)
    dbp_ref[:] = dbp_ref[:] + rowsum(dlogits)
    dwv_ref[:] = dwv_ref[:] + _row_t(h2, dv)
    dbv_ref[:] = dbv_ref[:] + rowsum(dv)

    dy2 = dh2 * (y2 > 0.0).astype(jnp.float32)
    dg2_ref[:] = dg2_ref[:] + rowsum(dy2 * xh2)
    dbe2_ref[:] = dbe2_ref[:] + rowsum(dy2)
    dxh2 = dy2 * g2_ref[:]
    dz2 = rstd2 * (
        dxh2
        - jnp.mean(dxh2, axis=1, keepdims=True)
        - xh2 * jnp.mean(dxh2 * xh2, axis=1, keepdims=True)
    )
    dw2_ref[:] = dw2_ref[:] + _row_t(h1, dz2)
    db2_ref[:] = db2_ref[:] + rowsum(dz2)
    dh1 = _t_right(dz2, w2)

    dy1 = dh1 * (y1 > 0.0).astype(jnp.float32)
    dg1_ref[:] = dg1_ref[:] + rowsum(dy1 * xh1)
    dbe1_ref[:] = dbe1_ref[:] + rowsum(dy1)
    dxh1 = dy1 * g1_ref[:]
    dz1 = rstd1 * (
        dxh1
        - jnp.mean(dxh1, axis=1, keepdims=True)
        - xh1 * jnp.mean(dxh1 * xh1, axis=1, keepdims=True)
    )
    dw1_ref[:] = dw1_ref[:] + _row_t(x, dz1)
    db1_ref[:] = db1_ref[:] + rowsum(dz1)


def supports(params: Any, batch_obs_dim: int | None = None) -> bool:
    """True when the param tree is the standard feedforward ActorCritic
    (two Dense+LayerNorm trunk layers + logits/value heads) this kernel
    hard-codes."""
    try:
        p = params["params"]
        need = {"Dense_0", "LayerNorm_0", "Dense_1", "LayerNorm_1",
                "Dense_2", "Dense_3"}
        if set(p.keys()) != need:
            return False
        if p["Dense_3"]["kernel"].shape[1] != 1:
            return False
        return p["Dense_0"]["kernel"].dtype == jnp.float32
    except (KeyError, TypeError, AttributeError):
        return False


def _pick_tile(n: int) -> int:
    for r in (1024, 512, 256, 128):
        if n % r == 0:
            return r
    return 0


def fused_ppo_grads(
    params: Any,
    batch,
    cfg: PPOConfig,
    *,
    interpret: bool = False,
):
    """Drop-in replacement for ``jax.grad(ppo_loss, has_aux=True)`` on the
    standard ActorCritic: returns ``(grads, metrics)`` with the same tree
    structure and the same metric keys/values.

    ``batch`` is a flat ``PPOBatch`` (no oracle labels).  Caller must check
    ``supports(params)`` and ``_pick_tile(B) > 0`` first (``make_grad_fn``
    does)."""
    interpret = interpret or jax.default_backend() == "cpu"
    p = params["params"]
    n = batch.obs.shape[0]
    r = _pick_tile(n)
    a = p["Dense_2"]["kernel"].shape[1]
    mxu_dtype = jnp.bfloat16 if cfg.bf16_compute else jnp.float32

    col = lambda x: x[:, None]  # [B] -> [B, 1]
    flat_in = (
        batch.obs,
        col(batch.actions.astype(jnp.int32)),
        col(batch.old_log_probs),
        col(batch.advantages),
        col(batch.returns),
        col(batch.old_values),
        p["Dense_0"]["kernel"], p["Dense_0"]["bias"][None, :],
        p["LayerNorm_0"]["scale"][None, :], p["LayerNorm_0"]["bias"][None, :],
        p["Dense_1"]["kernel"], p["Dense_1"]["bias"][None, :],
        p["LayerNorm_1"]["scale"][None, :], p["LayerNorm_1"]["bias"][None, :],
        p["Dense_2"]["kernel"], p["Dense_2"]["bias"][None, :],
        p["Dense_3"]["kernel"], p["Dense_3"]["bias"][None, :],
    )
    d = batch.obs.shape[1]
    h1 = p["Dense_0"]["kernel"].shape[1]
    h2 = p["Dense_1"]["kernel"].shape[1]

    row_spec = lambda width: pl.BlockSpec(
        (r, width), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    # unblocked: the whole array is VMEM-resident and revisited every grid
    # step (outputs accumulate in place across the sequential TPU grid)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    in_specs = [
        row_spec(d), row_spec(1), row_spec(1), row_spec(1), row_spec(1),
        row_spec(1),
    ] + [full()] * 12
    out_shapes = (
        jax.ShapeDtypeStruct((d, h1), jnp.float32),
        jax.ShapeDtypeStruct((1, h1), jnp.float32),
        jax.ShapeDtypeStruct((1, h1), jnp.float32),
        jax.ShapeDtypeStruct((1, h1), jnp.float32),
        jax.ShapeDtypeStruct((h1, h2), jnp.float32),
        jax.ShapeDtypeStruct((1, h2), jnp.float32),
        jax.ShapeDtypeStruct((1, h2), jnp.float32),
        jax.ShapeDtypeStruct((1, h2), jnp.float32),
        jax.ShapeDtypeStruct((h2, a), jnp.float32),
        jax.ShapeDtypeStruct((1, a), jnp.float32),
        jax.ShapeDtypeStruct((h2, 1), jnp.float32),
        jax.ShapeDtypeStruct((1, 1), jnp.float32),
        jax.ShapeDtypeStruct((1, 8), jnp.float32),
    )
    out_specs = tuple([full()] * 13)

    kernel = functools.partial(
        _kernel,
        n_total=n,
        num_actions=a,
        clip_eps=float(cfg.clip_epsilon),
        v_coef=float(cfg.value_loss_coef),
        ent_beta=float(cfg.entropy_beta),
        mxu_dtype=mxu_dtype,
    )
    outs = pl.pallas_call(
        kernel,
        grid=(n // r,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(*flat_in)

    (dw1, db1, dg1, dbe1, dw2, db2, dg2, dbe2,
     dwp, dbp, dwv, dbv, met) = outs
    grads = {"params": {
        "Dense_0": {"kernel": dw1, "bias": db1[0]},
        "LayerNorm_0": {"scale": dg1[0], "bias": dbe1[0]},
        "Dense_1": {"kernel": dw2, "bias": db2[0]},
        "LayerNorm_1": {"scale": dg2[0], "bias": dbe2[0]},
        "Dense_2": {"kernel": dwp, "bias": dbp[0]},
        "Dense_3": {"kernel": dwv, "bias": dbv[0]},
    }}
    inv_n = 1.0 / n
    pol = met[0, 0] * inv_n
    val = met[0, 1] * inv_n
    ent = met[0, 2] * inv_n
    metrics = {
        "loss/total": pol + val - float(cfg.entropy_beta) * ent,
        "loss/policy": pol,
        "loss/value": val,
        "loss/entropy": ent,
        "loss/approx_kl": met[0, 3] * inv_n,
        "loss/clip_frac": met[0, 4] * inv_n,
    }
    return grads, metrics


def make_grad_fn(params: Any, cfg: PPOConfig, batch_size: int):
    """Return the fused kernel as a ``grad_fn(params, apply_fn, mb, cfg)``
    -compatible callable, or None when unsupported (non-standard arch,
    ragged minibatch; oracle labels are checked by the caller).  Also None
    on CPU (tests/dryrun run autodiff — interpret-mode Pallas inside the
    training scan would be slow) and under a multi-device mesh (the kernel
    has no SPMD partitioning rule; multi-chip keeps the autodiff path,
    where XLA inserts the gradient all-reduce from sharding annotations)."""
    if jax.default_backend() == "cpu" or jax.device_count() > 1:
        return None
    if not supports(params) or _pick_tile(batch_size) == 0:
        return None

    def grad_fn(p, apply_fn, mb, c):
        del apply_fn
        return fused_ppo_grads(p, mb, c)

    return grad_fn
