"""Evaluation harnesses: greedy policy + stop gate, fully on device.

Reproduces the reference evaluators' statistical protocol:

  - ``ModelEvaluator.run_evaluation`` (PPOV1.1/evaluate_model.py:43-90):
    1000 greedy episodes, heuristic stop, deviation/success CSV;
  - ``evaluate_with_lstm.main`` V2.0 (PPOV2.0/evaluate_with_lstm.py:39-135):
    LSTM threshold stop, metrics npz {deviations, steps, success,
    stopped_early};
  - ``evaluate_with_lstm.main`` V2.1 (PPOV2.1/evaluate_with_lstm.py:29-118):
    PeakAndStop gate (stop_prob > 0.8), success@50px, sigma/peak predictions.

TPU-native form: all episodes run *in parallel* as vmapped envs inside one
jitted ``lax.scan`` with per-env finished-masking — the reference's 1000
serial episodes collapse into a single device program.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from tpu_plume.core.config import EnvConfig, EvalConfig, StopConfig
from tpu_plume.env.methane import reset, step
from tpu_plume.stop import controllers as ctrl


@struct.dataclass
class _EvalCarry:
    env_state: Any
    obs: jnp.ndarray
    stop_state: Any
    finished: jnp.ndarray
    steps: jnp.ndarray
    stopped_early: jnp.ndarray
    key: jax.Array
    policy_state: Any = None   # recurrent (c, h) carry; None for MLP
    guide_state: Any = None    # terminal-guidance state; None when unguided


@dataclasses.dataclass
class EvalMetrics:
    """The reference validation_metrics.npz schema
    (PPOV2.0/evaluate_with_lstm.py:63-68, 132)."""

    deviations: np.ndarray
    steps: np.ndarray
    success: np.ndarray
    stopped_early: np.ndarray
    peak_pred: np.ndarray | None = None
    final_conc: np.ndarray | None = None
    trajectories: np.ndarray | None = None  # [K, T, 3] (x, y, conc), NaN-padded
    sources: np.ndarray | None = None       # [N, 2] true source positions
    # guided-eval diagnostics (None when unguided): hover-mode flag and
    # fit-validity at episode end, accepted sample count, fit estimate
    guide_hover: np.ndarray | None = None
    guide_fit_ok: np.ndarray | None = None
    guide_samples: np.ndarray | None = None
    guide_est: np.ndarray | None = None  # [N, 2] trilateration estimate
    # refutation count at episode end (guides without the field report 0)
    guide_refutes: np.ndarray | None = None
    guide_dmin: np.ndarray | None = None    # closest committed approach to est
    guide_committed: np.ndarray | None = None  # committed at episode end
    # bank-match guides (evaluation/bank_guide.py): identified bank row at
    # episode end + the episode's true row (confusion-rate diagnostic)
    guide_match: np.ndarray | None = None
    field_idx: np.ndarray | None = None
    # in-plume sample count at episode end (bank guide: n_contact; guides
    # without the field report 0) — per-episode loss accounting needs to
    # split never-contacted flights from contacted-but-ungated ones
    guide_contacts: np.ndarray | None = None

    def save_csv(self, path: str):
        """The V1.1 evaluator's evaluation_results.csv schema
        (PPOV1.1/evaluate_model.py:77-87)."""
        import csv

        with open(path, "w", newline="") as fh:
            w = csv.writer(fh)
            w.writerow(["episode", "steps", "deviation", "success", "final_conc"])
            for i in range(len(self.deviations)):
                w.writerow([
                    i + 1,
                    int(self.steps[i]),
                    float(self.deviations[i]),
                    bool(self.success[i]),
                    float(self.final_conc[i]) if self.final_conc is not None else "",
                ])

    def save_npz(self, path: str):
        data = dict(
            deviations=self.deviations,
            steps=self.steps,
            success=self.success,
            stopped_early=self.stopped_early,
        )
        if self.peak_pred is not None:
            data["peak_pred"] = self.peak_pred
        # guide diagnostics (superset of the reference schema; present
        # only for guided runs so plain rows stay reference-shaped)
        for k in ("guide_hover", "guide_fit_ok", "guide_samples",
                  "guide_est", "guide_refutes", "guide_dmin",
                  "guide_committed", "guide_match", "field_idx",
                  "guide_contacts"):
            v = getattr(self, k)
            if v is not None:
                data[k] = v
        np.savez(path, **data)


# A stop gate bundles (per-env init pytree, step_fn(state, conc, pos) ->
# (state', stop_bool)) — see tpu_plume.stop.controllers.
StopGate = tuple[Any, Callable]


def make_threshold_gate(predict_fn: Callable, stop_cfg: StopConfig) -> StopGate:
    return (
        ctrl.threshold_init(stop_cfg),
        lambda s, conc, pos: ctrl.threshold_step(s, conc, predict_fn, stop_cfg),
    )


def make_peak_stop_gate(predict_fn: Callable, stop_cfg: StopConfig) -> StopGate:
    return (
        ctrl.peak_stop_init(stop_cfg),
        lambda s, conc, pos: ctrl.peak_stop_step(s, conc, predict_fn, stop_cfg),
    )


def make_heuristic_gate(eval_cfg: EvalConfig, conc_peak: float) -> StopGate:
    return (
        ctrl.heuristic_stop_init(eval_cfg),
        lambda s, conc, pos: ctrl.heuristic_stop_step(s, pos, conc, conc_peak, eval_cfg),
    )


def evaluate_policy(
    params: Any,
    apply_fn: Callable,
    env_cfg: EnvConfig,
    eval_cfg: EvalConfig,
    key: jax.Array,
    num_episodes: Optional[int] = None,
    stop_gate: Optional[StopGate] = None,
    max_steps: Optional[int] = None,
    greedy: bool = True,
    track_trajectories: int = 0,
    goal_radius: float | None = None,
    bank=None,
    rnn=None,
    guide=None,
    oracle=None,
) -> EvalMetrics:
    """Run ``num_episodes`` parallel greedy episodes; returns per-episode
    metrics in the reference npz layout.

    ``track_trajectories=K`` additionally records the position history of the
    first K episodes (for the V2.1-style per-episode trajectory PNGs,
    PPOV2.1/evaluate_with_lstm.py:96-107) in ``metrics.trajectories``
    [K, T, 3] (x, y, conc) with NaN past episode end.

    ``goal_radius`` overrides the env's episode-termination radius (the
    reference protocol uses the INITIAL_RADIUS=50 of a fresh env; setting the
    trained curriculum radius instead measures true localization precision —
    the <5-unit north star).

    ``guide`` is an optional ``(init_state, step_fn)`` terminal-guidance
    controller (see ``tpu_plume.evaluation.guidance``): once its source
    estimate is well-conditioned it overrides the policy's action to
    phase-control the goal-ball crossing.

    ``oracle`` (``evaluation.oracle.make_oracle``) replaces the policy
    entirely with the scripted privileged teacher — the fast path for
    ceiling measurements (``eval --oracle phase``); ``params``/``apply_fn``
    may be None and ``guide`` should not be combined with it."""
    # ``rnn`` (a RecurrentActorCritic) switches to the hidden-carrying
    # policy step — the PPO+LSTM policy; episodes never restart inside the
    # eval scan, so no reset bookkeeping is needed.
    n = num_episodes or eval_cfg.episodes
    length = max_steps or min(env_cfg.max_steps, eval_cfg.max_eval_steps)

    k_reset, k_scan = jax.random.split(key)
    reset_keys = jax.random.split(k_reset, n)

    # bank rides as a jit ARGUMENT: a closed-over bank becomes a compiled
    # constant, which the tunneled backend serializes into the compile
    # request (a packed 3-D bank blows the transport limit — HTTP 413).
    def run(reset_keys, k_scan, bank):
        env_state, obs = jax.vmap(
            lambda k: reset(k, env_cfg, radius=goal_radius, bank=bank)
        )(reset_keys)
        if stop_gate is not None:
            stop_init, stop_fn = stop_gate
            stop_state = jax.tree.map(
                lambda x: jnp.broadcast_to(x, (n,) + jnp.shape(x)), stop_init
            )
        else:
            stop_state = jnp.zeros(n)  # dummy

        if guide is not None:
            g_init, _ = guide
            guide_state = jax.tree.map(
                lambda x: jnp.broadcast_to(x, (n,) + jnp.shape(x)), g_init
            )
        else:
            guide_state = None
        carry = _EvalCarry(
            env_state=env_state,
            obs=obs,
            stop_state=stop_state,
            finished=jnp.zeros(n, bool),
            steps=jnp.zeros(n, jnp.int32),
            stopped_early=jnp.zeros(n, bool),
            key=k_scan,
            policy_state=rnn.initial_state(n) if rnn is not None else None,
            guide_state=guide_state,
        )

        def body(c: _EvalCarry, _):
            key, k_act, k_step = jax.random.split(c.key, 3)
            if oracle is not None:
                pol_state = c.policy_state
                action = jax.vmap(oracle)(c.env_state)
            else:
                if rnn is not None:
                    pol_state, logits, _ = rnn.apply(
                        params, c.policy_state, c.obs
                    )
                else:
                    pol_state = c.policy_state
                    logits, _ = apply_fn(params, c.obs)
                if greedy:
                    action = jnp.argmax(logits, axis=-1)
                else:
                    action = jax.random.categorical(k_act, logits, axis=-1)
            if guide is not None:
                _, g_fn = guide
                if getattr(g_fn, "needs_source", False):
                    # diagnostic guides (scripts/guide_truth.py) receive the
                    # episode's TRUE source as a 5th argument
                    new_guide, action, _ = jax.vmap(g_fn)(
                        c.guide_state, c.env_state.pos, c.env_state.conc,
                        action, c.env_state.field.source,
                    )
                elif getattr(g_fn, "needs_bank", False):
                    # bank-match guides (evaluation/bank_guide.py) receive
                    # the TRACED bank (shared, not per-env) + episode step
                    new_guide, action, _ = jax.vmap(
                        g_fn, in_axes=(0, 0, 0, 0, None, 0)
                    )(
                        c.guide_state, c.env_state.pos, c.env_state.conc,
                        action, bank, c.env_state.t,
                    )
                else:
                    new_guide, action, _ = jax.vmap(g_fn)(
                        c.guide_state, c.env_state.pos, c.env_state.conc,
                        action,
                    )
            else:
                new_guide = c.guide_state
            step_keys = jax.random.split(k_step, n)
            new_env, trans = jax.vmap(lambda s, a, k: step(s, a, k, env_cfg, bank))(
                c.env_state, action, step_keys
            )

            if stop_gate is not None:
                new_stop, stop_fired = jax.vmap(stop_fn)(
                    c.stop_state, trans.info.conc_raw, new_env.pos
                )
            else:
                new_stop, stop_fired = c.stop_state, jnp.zeros(n, bool)

            active = ~c.finished
            keep = lambda new, old: jax.tree.map(
                lambda a, b: jnp.where(
                    active.reshape((-1,) + (1,) * (a.ndim - 1)), a, b
                ),
                new,
                old,
            )
            env_state = keep(new_env, c.env_state)
            obs = jnp.where(active[:, None], trans.obs, c.obs)
            stop_state = keep(new_stop, c.stop_state)
            pol = keep(pol_state, c.policy_state) if rnn is not None else pol_state
            gstate = keep(new_guide, c.guide_state) if guide is not None else None
            steps = c.steps + active.astype(jnp.int32)
            stopped_early = c.stopped_early | (active & stop_fired)
            finished = c.finished | trans.done | stop_fired
            if track_trajectories:
                k = track_trajectories
                tracked = jnp.where(
                    active[:k, None],
                    jnp.concatenate(
                        [env_state.pos[:k, :2], env_state.conc[:k, None]], axis=1
                    ),
                    jnp.nan,
                )
            else:
                tracked = None
            return (
                _EvalCarry(env_state, obs, stop_state, finished, steps,
                           stopped_early, key, pol, gstate),
                tracked,
            )

        carry, tracked = jax.lax.scan(body, carry, None, length=length)
        # planimetric deviation (3-D flight keeps the horizontal success gate)
        deviation = jnp.linalg.norm(
            carry.env_state.pos[:, :2] - carry.env_state.field.source, axis=-1
        )
        peak_pred = (
            carry.stop_state.peak_pred
            if isinstance(carry.stop_state, ctrl.PeakStopState)
            else None
        )
        if guide is not None:
            gdiag = (carry.guide_state.mode, carry.guide_state.est_ok,
                     carry.guide_state.count, carry.guide_state.est,
                     getattr(carry.guide_state, "refutes",
                             jnp.zeros_like(carry.guide_state.mode)),
                     getattr(carry.guide_state, "d_min",
                             jnp.zeros_like(carry.guide_state.est_ok,
                                            jnp.float32)),
                     getattr(carry.guide_state, "committed",
                             jnp.zeros_like(carry.guide_state.est_ok)),
                     # bank-match guides: identified row vs the true row
                     getattr(carry.guide_state, "match",
                             jnp.zeros_like(carry.guide_state.mode)),
                     carry.env_state.field.idx,
                     getattr(carry.guide_state, "n_contact",
                             jnp.zeros_like(carry.guide_state.mode)))
        else:
            gdiag = None
        return (deviation, carry.steps, carry.stopped_early, peak_pred,
                carry.env_state.conc, tracked, gdiag,
                carry.env_state.field.source)

    (deviation, steps, stopped_early, peak_pred, final_conc, tracked,
     gdiag, sources) = jax.jit(run)(reset_keys, k_scan, bank)
    deviation = np.asarray(deviation)
    return EvalMetrics(
        deviations=deviation,
        steps=np.asarray(steps),
        success=deviation <= eval_cfg.success_distance,
        stopped_early=np.asarray(stopped_early),
        peak_pred=None if peak_pred is None else np.asarray(peak_pred),
        final_conc=np.asarray(final_conc),
        trajectories=None if tracked is None else np.swapaxes(np.asarray(tracked), 0, 1),
        sources=np.asarray(sources),
        guide_hover=None if gdiag is None else np.asarray(gdiag[0]) == 1,
        guide_fit_ok=None if gdiag is None else np.asarray(gdiag[1]),
        guide_samples=None if gdiag is None else np.asarray(gdiag[2]),
        guide_est=None if gdiag is None else np.asarray(gdiag[3]),
        guide_refutes=None if gdiag is None else np.asarray(gdiag[4]),
        guide_dmin=None if gdiag is None else np.asarray(gdiag[5]),
        guide_committed=None if gdiag is None else np.asarray(gdiag[6]),
        guide_match=None if gdiag is None else np.asarray(gdiag[7]),
        field_idx=None if gdiag is None else np.asarray(gdiag[8]),
        guide_contacts=None if gdiag is None else np.asarray(gdiag[9]),
    )


def summarize(m: EvalMetrics) -> dict:
    """The reference's printed summary block
    (PPOV2.0/evaluate_with_lstm.py:112-129)."""
    succ_dev = m.deviations[m.success]
    return {
        "mean_deviation": float(m.deviations.mean()),
        "std_deviation": float(m.deviations.std()),
        "success_rate": float(m.success.mean()),
        "success_mean_deviation": float(succ_dev.mean()) if succ_dev.size else 0.0,
        "success_std_deviation": float(succ_dev.std()) if succ_dev.size else 0.0,
        "early_stop_rate": float(m.stopped_early.mean()),
        "mean_steps": float(m.steps.mean()),
    }


def generate_expert_data(
    params: Any,
    apply_fn: Callable,
    env_cfg: EnvConfig,
    key: jax.Array,
    num_episodes: int = 100,
    path: str | None = None,
    bank=None,
    rnn=None,
    oracle=None,
):
    """Greedy-rollout (state, action) collection — the reference expert-data
    pipeline (PPOV1.1/generate_expert_data.py:14-61).

    ``oracle``: a jittable ``fn(env_state) -> i32 action`` (see
    ``evaluation.oracle.make_oracle``) used INSTEAD of the policy network —
    privileged-teacher demonstrations; ``params``/``apply_fn`` may be None."""
    n = num_episodes
    k_reset, k_scan = jax.random.split(key)
    reset_keys = jax.random.split(k_reset, n)

    def run(reset_keys, k_scan, bank):
        env_state, obs = jax.vmap(lambda k: reset(k, env_cfg, bank=bank))(reset_keys)
        finished = jnp.zeros(n, bool)
        pol0 = rnn.initial_state(n) if rnn is not None else jnp.zeros(n)

        def body(carry, _):
            env_state, obs, finished, key, pol = carry
            key, k_step = jax.random.split(key)
            if oracle is not None:
                action = jax.vmap(oracle)(env_state)
            elif rnn is not None:
                pol, logits, _ = rnn.apply(params, pol, obs)
                action = jnp.argmax(logits, axis=-1)
            else:
                logits, _ = apply_fn(params, obs)
                action = jnp.argmax(logits, axis=-1)
            step_keys = jax.random.split(k_step, n)
            new_env, trans = jax.vmap(lambda s, a, k: step(s, a, k, env_cfg, bank))(
                env_state, action, step_keys
            )
            active = ~finished
            out = (obs, action, active)
            env_state = jax.tree.map(
                lambda a, b: jnp.where(active.reshape((-1,) + (1,) * (a.ndim - 1)), a, b),
                new_env,
                env_state,
            )
            obs = jnp.where(active[:, None], trans.obs, obs)
            finished = finished | trans.done
            return (env_state, obs, finished, key, pol), out

        _, (states, actions, valid) = jax.lax.scan(
            body, (env_state, obs, finished, k_scan, pol0), None,
            length=env_cfg.max_steps,
        )
        return states, actions, valid

    states, actions, valid = jax.jit(run)(reset_keys, k_scan, bank)
    mask = np.asarray(valid).reshape(-1)
    states = np.asarray(states).reshape(-1, env_cfg.obs_dim)[mask]
    actions = np.asarray(actions).reshape(-1)[mask]
    if path is not None:
        from tpu_plume.data.expert import save_expert_data

        save_expert_data(path, states, actions)
    return states, actions
