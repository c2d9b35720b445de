"""A/B the round-3 guide changes (dive commitment latch + stuck-hover
fallback) against the round-2 behavior, CPU-forced.

Usage: python scripts/guide_ab.py <ckpt_dir> [episodes] [seed] [preset] [goal_radius]
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
    make_guide,
)
from tpu_plume.train.ppo_trainer import make_policy_model  # noqa: E402


def main():
    ckpt = sys.argv[1]
    n_eval = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    preset = sys.argv[4] if len(sys.argv) > 4 else "ppo_v2_0"
    goal_radius = float(sys.argv[5]) if len(sys.argv) > 5 else None
    cfg = get_preset(preset)
    cfg = cfg.replace(env=dataclasses.replace(
        cfg.env, obs_memory=True, reward_variant="delta"))
    model = make_policy_model(cfg)
    params = jax.tree.map(jnp.asarray, restore_checkpoint(ckpt)["params"])

    base = derive_guide_config(
        cfg.env, 50.0 if goal_radius is None else goal_radius,
        cfg.eval.success_distance)
    arms = {
        "shipped v2": base,
        "no fallback": dataclasses.replace(base, fallback_patience=0),
        "no latch, no fallback (v1-like)": dataclasses.replace(
            base, commit_on_ok=False, fallback_patience=0,
            phantom_patience=0, bias_alpha=0.0),
        "no calibration": dataclasses.replace(base, bias_alpha=0.0),
    }
    for name, gcfg in arms.items():
        guide = make_guide(cfg.env, gcfg=gcfg)
        m = evaluate_policy(
            params, model.apply, cfg.env, cfg.eval,
            jax.random.PRNGKey(seed), num_episodes=n_eval, greedy=True,
            guide=guide, goal_radius=goal_radius,
        )
        dev = np.asarray(m.deviations)
        print(name, json.dumps(dict(
            s40=float(np.mean(dev <= 40.0)),
            bullseye=(float(np.mean(dev <= goal_radius))
                      if goal_radius else None),
            mean_dev=float(np.mean(dev)),
            succ_dev=float(np.mean(dev[dev <= 40.0])),
            mean_steps=float(np.mean(m.steps)),
            fit_ok=float(np.mean(m.guide_fit_ok)),
        )), flush=True)


if __name__ == "__main__":
    main()
