"""DAgger (Ross et al. 2011) against the scripted phase oracle.

Pure behavior cloning of the phase oracle fails closed-loop (87.7%%
per-step validation accuracy, 5.3%% protocol success — measured round 3):
compounding action errors drift the student off the teacher's state
distribution, where the clone has no recovery data.  DAgger fixes exactly
this: each round rolls out the CURRENT student, labels every visited state
with the oracle's action, aggregates, and refits — so the dataset covers
the student's own mistakes.

TPU-native shape: the oracle (``evaluation.oracle.make_oracle``) is a pure
jnp function of the env state, so collection is one jitted vmapped
``lax.scan`` per round — rollout, oracle labeling, and the student/teacher
mixture all on device; one host transfer per round.  The refit reuses
``bc.make_bc_fitter`` (one jitted epochs x minibatches scan; sequence
students use ``bc.make_seq_bc_fitter``'s full-episode BPTT).

No reference counterpart (its imitation path is GAIL-only,
PPOV1.1/train_ppo_gail.py) — this is the privileged-teacher distillation
route to approach-phase control, the measured 42%%->85%% success@40
headroom (scripts/oracle_ceiling.py).
"""
from __future__ import annotations

import os
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from tpu_plume.core.config import TrainConfig


@dataclass
class DaggerResult:
    params: dict
    rounds: int
    samples: int
    val_accuracy: float
    eval_success: list = field(default_factory=list)  # per-round probe s@40


def _collect(model, oracle, env_cfg, n, beta, rnn=False):
    """Jittable round collection: roll out the beta-mixture policy
    (oracle w.p. beta, else greedy student), record (obs, oracle action)
    at every active step plus each episode's protocol outcome.  With
    ``rnn`` the student's (c, h) carry threads through the scan (it is
    fed every obs even on oracle-driven steps, matching replay)."""
    from tpu_plume.env.methane import reset, step

    def run(params, reset_keys, k_scan):
        env_state, obs = jax.vmap(lambda k: reset(k, env_cfg))(reset_keys)
        finished = jnp.zeros(n, bool)
        succ = jnp.zeros(n, bool)
        hidden = model.initial_state(n) if rnn else jnp.zeros(n)

        def body(carry, _):
            env_state, obs, finished, succ, hidden, key = carry
            key, k_step, k_mix = jax.random.split(key, 3)
            a_star = jax.vmap(oracle)(env_state)
            if rnn:
                hidden, logits, _ = model.apply(params, hidden, obs)
            else:
                logits, _ = model.apply(params, obs)
            a_student = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            use_star = jax.random.bernoulli(k_mix, beta, (n,))
            action = jnp.where(use_star, a_star, a_student)
            step_keys = jax.random.split(k_step, n)
            new_env, trans = jax.vmap(
                lambda s, a, k: step(s, a, k, env_cfg)
            )(env_state, action, step_keys)
            active = ~finished
            out = (obs, a_star, active)
            env_state = jax.tree.map(
                lambda a, b: jnp.where(
                    active.reshape((-1,) + (1,) * (a.ndim - 1)), a, b
                ),
                new_env,
                env_state,
            )
            obs = jnp.where(active[:, None], trans.obs, obs)
            succ = succ | (
                active & trans.done & trans.info.reached
                & (trans.info.distance <= 40.0)
            )
            finished = finished | trans.done
            return (env_state, obs, finished, succ, hidden, key), out

        (_, _, finished, succ, _, _), (states, labels, valid) = jax.lax.scan(
            body,
            (env_state, obs, finished, succ, hidden, jnp.asarray(k_scan)),
            None, length=env_cfg.max_steps,
        )
        return states, labels, valid, succ, finished

    return jax.jit(run)


def train_dagger(
    cfg: TrainConfig,
    out_dir: str | None,
    *,
    oracle_kind: str = "phase",
    rounds: int = 8,
    episodes_per_round: int = 512,
    epochs_per_round: int = 20,
    batch_size: int = 4096,
    lr: float = 1e-3,
    max_round_samples: int = 65536,
    val_frac: float = 0.05,
    seq_episode_cap: int = 1024,
    verbose: bool = True,
) -> DaggerResult:
    """Round 0 collects with the oracle driving (beta=1, = BC); later
    rounds collect with the student driving (beta=0) and the oracle only
    labeling.  Each round refits on the aggregate (warm-started params,
    fresh optimizer), and the collection's own mixture rollout doubles as
    a closed-loop success probe.  Saves ``{"params": ...}`` like
    ``train_bc`` (usable by ``train --ckpt`` / ``eval --ckpt``).

    ``arch="lstm"`` runs SEQUENCE DAgger: the student is the recurrent
    policy, collection threads its (c, h) carry, and the refit is
    full-episode BPTT (``bc.make_seq_bc_fitter``).  This is the
    representational fix for the feedforward ceiling — on student-visited
    off-path states the oracle's action is only ~55%% predictable from the
    instantaneous obs (direction to source is unobservable without
    memory), measured round 3."""
    from tpu_plume.evaluation.oracle import make_oracle
    from tpu_plume.train.bc import make_bc_fitter, make_seq_bc_fitter
    from tpu_plume.train.ppo_trainer import make_policy_model

    rnn = cfg.ppo.arch == "lstm"
    env_cfg = cfg.env
    model = make_policy_model(cfg)
    oracle = make_oracle(oracle_kind, env_cfg)
    key = jax.random.PRNGKey(cfg.seed)
    key, k_init = jax.random.split(key)
    if rnn:
        params = model.init(
            k_init, model.initial_state(2),
            jnp.zeros((2, env_cfg.obs_dim), jnp.float32),
        )
    else:
        params = model.init(
            k_init, jnp.zeros((2, env_cfg.obs_dim), jnp.float32)
        )

    n = episodes_per_round
    collectors = {
        beta: _collect(model, oracle, env_cfg, n, beta, rnn=rnn)
        for beta in (1.0, 0.0)
    }
    if rnn:
        fit = make_seq_bc_fitter(
            model, epochs=epochs_per_round,
            batch_episodes=max(8, batch_size // env_cfg.max_steps), lr=lr,
        )
    else:
        fit = make_bc_fitter(
            model, epochs=epochs_per_round, batch_size=batch_size, lr=lr
        )
    xs, ys, ms = [], [], []
    eval_success = []
    rng = np.random.default_rng(cfg.seed)
    for r in range(rounds):
        beta = 1.0 if r == 0 else 0.0
        key, k_reset, k_scan = jax.random.split(key, 3)
        reset_keys = jax.random.split(k_reset, n)
        states, labels, valid, succ, finished = jax.device_get(
            collectors[beta](params, reset_keys, k_scan)
        )
        if rnn:
            # Episode-major aggregate: [T, N, D] columns concat on N.
            xs.append(states)
            ys.append(labels)
            ms.append(valid)
            x_all = np.concatenate(xs, axis=1)
            y_all = np.concatenate(ys, axis=1)
            m_all = np.concatenate(ms, axis=1)
            n_eps = x_all.shape[1]
            order = rng.permutation(n_eps)
            n_val = max(1, min(256, n_eps // 20))
            va, tr = order[:n_val], order[n_val:]
            # pow2 episode capacity by cyclic repetition (same program-
            # shape discipline as the flat path below), bounded by
            # ``seq_episode_cap``: the [T, 2048]-episode BPTT fit program
            # reproducibly CRASHES the axon TPU worker ("kernel fault",
            # 2026-08-18, twice at the identical point), so the aggregate
            # is random-subsampled to the last-known-good program shape —
            # reservoir-style DAgger, each round fits a fresh uniform
            # subset of the full aggregate.
            cap = 1 << max(7, int(np.ceil(np.log2(tr.size))))
            cap = min(cap, seq_episode_cap)
            rep = (rng.choice(tr, cap, replace=False)
                   if tr.size > cap else np.resize(tr, (cap,)))
            vrep = np.resize(va, (256,))
            key, k_fit = jax.random.split(key)
            params, losses, val_loss, val_acc = fit(
                params,
                jnp.asarray(x_all[:, rep]),
                jnp.asarray(y_all[:, rep], jnp.int32),
                jnp.asarray(m_all[:, rep]),
                jnp.asarray(x_all[:, vrep]),
                jnp.asarray(y_all[:, vrep], jnp.int32),
                jnp.asarray(m_all[:, vrep]),
                k_fit,
            )
            added, total = int(valid.sum()), int(m_all.sum())
        else:
            mask = valid.reshape(-1)
            x = states.reshape(-1, env_cfg.obs_dim)[mask]
            y = labels.reshape(-1)[mask]
            if x.shape[0] > max_round_samples:
                sel = rng.choice(x.shape[0], max_round_samples, replace=False)
                x, y = x[sel], y[sel]
            xs.append(x)
            ys.append(y)
            x_all = np.concatenate(xs)
            y_all = np.concatenate(ys)
            order = rng.permutation(x_all.shape[0])
            n_val = max(1, min(4096, int(x_all.shape[0] * val_frac)))
            va, tr = order[:n_val], order[n_val:]
            # Pad the fit set to a power-of-two capacity by cyclic
            # repetition: the jitted fit program's shape then only changes
            # when the aggregate doubles (~log2(rounds) recompiles instead
            # of one per round — tunnel compiles cost minutes).  Duplicates
            # are uniform, so minibatch SGD semantics are unchanged.
            cap = 1 << max(12, int(np.ceil(np.log2(tr.size))))
            x_fit = np.resize(x_all[tr], (cap, x_all.shape[1]))
            y_fit = np.resize(y_all[tr], (cap,))
            x_val = np.resize(x_all[va], (4096, x_all.shape[1]))
            y_val = np.resize(y_all[va], (4096,))
            key, k_fit = jax.random.split(key)
            params, losses, val_loss, val_acc = fit(
                params,
                jnp.asarray(x_fit), jnp.asarray(y_fit, jnp.int32),
                jnp.asarray(x_val), jnp.asarray(y_val, jnp.int32),
                k_fit,
            )
            added, total = x.shape[0], x_all.shape[0]
        losses, val_loss, val_acc = jax.device_get((losses, val_loss, val_acc))
        s_rate = float(succ.mean())
        eval_success.append(s_rate)
        if verbose:
            who = "oracle-driven" if beta == 1.0 else "student-driven"
            print(
                f"dagger round {r} ({who}): +{added} -> "
                f"{total} pairs, fit {losses[-1]:.3f}, "
                f"val acc {float(val_acc):.1%}, rollout s@40 {s_rate:.1%} "
                f"(find {float(finished.mean()):.1%})",
                flush=True,
            )
        if out_dir:
            # Checkpoint every round (overwrite): a truncated run keeps its
            # latest fit.
            os.makedirs(out_dir, exist_ok=True)
            from tpu_plume.data.checkpoint import save_checkpoint

            save_checkpoint(
                os.path.join(out_dir, "checkpoint"),
                {"params": jax.device_get(params)},
            )
    return DaggerResult(
        params=params,
        rounds=rounds,
        samples=int(sum(m.sum() for m in ms)) if rnn
        else int(sum(a.shape[0] for a in xs)),
        val_accuracy=float(val_acc),
        eval_success=eval_success,
    )
