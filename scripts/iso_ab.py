"""TPU A/B for isotropic guide knobs (the CPU counterpart is
guide_ab.py): one guided eval per arm, arms given as a JSON list of
GuideConfig override dicts.

Usage:
  ISO_ARMS='[{}, {"probe_in_min": 87.0}, {"probe_consistency": 2}]' \
    python scripts/iso_ab.py [ckpt] [episodes] [seed] [goal_radius]

Provenance: the round-3 accidental-rim-crossing study (RESULTS.md) —
guide_diag classified 14.8% of guided episodes as hover accidents at
d_pt 74-83, i.e. inside probe_in_min's 5-px turbulence margin.
"""
from __future__ import annotations

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tpu_plume.core import get_preset
from tpu_plume.data.checkpoint import restore_checkpoint
from tpu_plume.evaluation import evaluate_policy
from tpu_plume.evaluation.guidance import derive_guide_config, make_guide
from tpu_plume.train.ppo_trainer import make_policy_model

CKPT = sys.argv[1] if len(sys.argv) > 1 else "/root/runs/r3s_control/checkpoint"
EPISODES = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
SEED = int(sys.argv[3]) if len(sys.argv) > 3 else 0
GOAL_R = float(sys.argv[4]) if len(sys.argv) > 4 else None
ARMS = json.loads(os.environ.get("ISO_ARMS", "[{}]"))

cfg = get_preset("ppo_v2_0")
cfg = cfg.replace(env=dataclasses.replace(
    cfg.env, obs_memory=True, reward_variant="delta"))
model = make_policy_model(cfg)
params = jax.tree.map(jnp.asarray, restore_checkpoint(CKPT)["params"])
base = derive_guide_config(
    cfg.env, 50.0 if GOAL_R is None else GOAL_R, cfg.eval.success_distance)

for overrides in ARMS:
    gcfg = dataclasses.replace(base, **overrides)
    m = evaluate_policy(
        params, model.apply, cfg.env, cfg.eval, jax.random.PRNGKey(SEED),
        num_episodes=EPISODES, greedy=True, guide=make_guide(cfg.env, gcfg=gcfg),
        goal_radius=GOAL_R,
    )
    dev = np.asarray(m.deviations)
    print(json.dumps(dict(
        arm=overrides,
        s40=float(np.mean(dev <= 40.0)),
        bullseye=float(np.mean(dev <= GOAL_R)) if GOAL_R else None,
        mean_dev=float(np.mean(dev)),
        succ_dev=float(np.mean(dev[dev <= 40.0])) if (dev <= 40).any() else None,
        mean_steps=float(np.mean(m.steps)),
        fit_ok=float(np.mean(m.guide_fit_ok)),
    )), flush=True)
