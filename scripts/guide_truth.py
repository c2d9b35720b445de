"""Decompose the guided-system gap to the 85.0% phase-control ceiling
(round-3 VERDICT next-step #1).

Three arms over the same checkpoint, seeds, and protocol (CPU-forced):

  1. guided (estimate)  — the shipped v2 guide; the headline number.
  2. guided (truth)     — the SAME FSM (hover entry, sample gates,
     commitment timing) with the TRUE source injected into the phase
     lookahead once the controller steers (guide_step(true_source=...)).
     This is the controller's own ceiling at its real engagement pattern.
  3. phase oracle       — perfect information from step 0
     (scripts/oracle_ceiling.py's 85.0% row, evaluation/oracle.py).

The splits:  (oracle - truth) = engagement cost (hover latency, accidental
rim crossings, never-contacted episodes);  (truth - estimate) = estimator
error cost (fit latency + residual position error at the dive).  Whichever
bucket dominates is where the next ~10pp live.

Usage: python scripts/guide_truth.py <ckpt_dir> [episodes] [seed]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import dataclasses  # noqa: E402
import json  # noqa: E402

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from tpu_plume.core import get_preset  # noqa: E402
from tpu_plume.data.checkpoint import restore_checkpoint  # noqa: E402
from tpu_plume.evaluation import evaluate_policy  # noqa: E402
from tpu_plume.evaluation.guidance import (  # noqa: E402
    derive_guide_config,
    guide_init,
    guide_step,
    make_guide,
)
from tpu_plume.evaluation.oracle import make_oracle  # noqa: E402
from tpu_plume.train.ppo_trainer import make_policy_model  # noqa: E402


def report(name, m, goal=40.0):
    dev = np.asarray(m.deviations)
    out = dict(
        s40=float(np.mean(dev <= goal)),
        mean_dev=float(np.mean(dev)),
        succ_dev=(float(np.mean(dev[dev <= goal])) if (dev <= goal).any()
                  else 0.0),
        mean_steps=float(np.mean(m.steps)),
    )
    if m.guide_committed is not None:
        committed = np.asarray(m.guide_committed)
        hover = np.asarray(m.guide_hover)
        timeout = np.asarray(m.steps) >= 1000
        out.update(
            commit_rate=float(committed.mean()),
            s40_committed=(float(np.mean(dev[committed] <= goal))
                           if committed.any() else 0.0),
            s40_uncommitted=(float(np.mean(dev[~committed] <= goal))
                             if (~committed).any() else 0.0),
            hover_end=float(hover.mean()),
            timeout=float(timeout.mean()),
        )
    print(f"{name:>24}", json.dumps(out), flush=True)
    return out


def main():
    ckpt = sys.argv[1]
    n_eval = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    cfg = get_preset("ppo_v2_0")
    cfg = cfg.replace(env=dataclasses.replace(
        cfg.env, obs_memory=True, reward_variant="delta"))
    model = make_policy_model(cfg)
    params = jax.tree.map(jnp.asarray, restore_checkpoint(ckpt)["params"])
    gcfg = derive_guide_config(cfg.env, 50.0, cfg.eval.success_distance)

    # arm 1: shipped v2 guide on its own estimate
    m1 = evaluate_policy(
        params, model.apply, cfg.env, cfg.eval, jax.random.PRNGKey(seed),
        num_episodes=n_eval, greedy=True, guide=make_guide(cfg.env, gcfg=gcfg),
    )
    r1 = report("guided (estimate)", m1)

    # arm 2: same FSM, true source injected into the steering lookahead
    def truth_fn(gs, pos, conc, act, src):
        return guide_step(gs, pos, conc, act, cfg.env, gcfg, true_source=src)

    truth_fn.needs_source = True
    m2 = evaluate_policy(
        params, model.apply, cfg.env, cfg.eval, jax.random.PRNGKey(seed),
        num_episodes=n_eval, greedy=True, guide=(guide_init(gcfg), truth_fn),
    )
    r2 = report("guided (truth)", m2)

    # arm 3: perfect-information phase oracle from step 0
    m3 = evaluate_policy(
        None, None, cfg.env, cfg.eval, jax.random.PRNGKey(seed),
        num_episodes=n_eval, greedy=True,
        oracle=make_oracle("phase", cfg.env),
    )
    r3 = report("phase oracle", m3)

    print(json.dumps(dict(
        estimator_cost_pp=100.0 * (r2["s40"] - r1["s40"]),
        engagement_cost_pp=100.0 * (r3["s40"] - r2["s40"]),
    )))


if __name__ == "__main__":
    main()
