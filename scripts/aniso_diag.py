"""Closed-loop loss-pool classification for the anisotropic model-fit
guide: runs a guided eval through the harness and splits episodes by the
final guide diagnostics (steered vs unsteered, estimate error, accepted
sample counts) — the measurement behind the round-3 "contact-limited"
finding and the --inplume-bonus knob (RESULTS.md).

Usage: python scripts/aniso_diag.py [ckpt_dir] [episodes] [goal_radius] [seed]
A/B knob overrides via ANISO_OVERRIDES='{"phantom_max_refutes": 6}'.
"""
import json
import os
import sys

sys.path.insert(0, ".")

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tpu_plume.core.config import get_preset
from tpu_plume.data.checkpoint import restore_checkpoint
from tpu_plume.evaluation import evaluate_policy
from tpu_plume.evaluation.aniso_fit import derive_aniso_config, make_aniso_guide
from tpu_plume.evaluation.guidance import make_guide
from tpu_plume.models import ActorCritic

CKPT = sys.argv[1] if len(sys.argv) > 1 else "/root/runs/r3s_wrf/checkpoint"
EPISODES = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
GOAL_R = float(sys.argv[3]) if len(sys.argv) > 3 else None
SEED = int(sys.argv[4]) if len(sys.argv) > 4 else 0
OVERRIDES = json.loads(os.environ.get("ANISO_OVERRIDES", "{}"))

cfg = get_preset("wrf_les")
env = dataclasses.replace(cfg.env, reward_variant="delta", obs_memory=True)
params = jax.tree.map(jnp.asarray, restore_checkpoint(CKPT)["params"])
model = ActorCritic(num_actions=env.num_actions)
ev = dataclasses.replace(cfg.eval, episodes=EPISODES)
if OVERRIDES:
    gcfg = dataclasses.replace(
        derive_aniso_config(env, terminate_radius=GOAL_R or 50.0),
        **OVERRIDES)
    print("overrides:", OVERRIDES)
    guide = make_aniso_guide(env, gcfg=gcfg)
else:
    guide = make_guide(env, terminate_radius=GOAL_R)
m = evaluate_policy(params, model.apply, env, ev, jax.random.PRNGKey(SEED),
                    num_episodes=EPISODES, greedy=True, goal_radius=GOAL_R,
                    guide=guide)

if GOAL_R is not None:
    print(f"goal_radius {GOAL_R}: bullseye "
          f"{(m.deviations <= GOAL_R).mean():.3f}, timeouts "
          f"{(m.steps >= env.max_steps - 1).mean():.3f}")
succ = m.success
steered = m.guide_hover  # final-step overriding flag
est_err = np.linalg.norm(m.guide_est - m.sources, axis=-1)
print(f"success {succ.mean():.3f}  steered-at-end {steered.mean():.3f}  "
      f"fit_ok-at-end {m.guide_fit_ok.mean():.3f}")
for name, mask in [("steered", steered), ("unsteered", ~steered)]:
    if mask.sum() == 0:
        continue
    print(f"{name}: {mask.mean():6.2%} of eps | success {succ[mask].mean():.3f}"
          f" | est err med {np.median(est_err[mask]):6.1f} px | samples med "
          f"{np.median(m.guide_samples[mask]):4.0f} | steps "
          f"{m.steps[mask].mean():5.0f}")
fail = ~succ
um = ~steered & fail
print(f"unsteered failures: {um.mean():.2%} of all — samples med "
      f"{np.median(m.guide_samples[um]) if um.sum() else 0:.0f}, timeout "
      f"frac {(m.steps[um] >= env.max_steps - 1).mean() if um.sum() else 0:.2%}")
if m.guide_refutes is not None and um.sum():
    r = m.guide_refutes[um]
    print(f"  refutes among unsteered failures: 0/1/2/3+ = "
          f"{(r == 0).mean():.2f}/{(r == 1).mean():.2f}/"
          f"{(r == 2).mean():.2f}/{(r >= 3).mean():.2f} | "
          f"est err med {np.median(est_err[um]):.1f} px | fit_ok-at-end "
          f"{m.guide_fit_ok[um].mean():.2f}")
sm = steered & fail
if sm.sum():
    print(f"steered failures: {sm.mean():.2%} of all — est err med "
          f"{np.median(est_err[sm]):.1f} px, dev med "
          f"{np.median(m.deviations[sm]):.0f}")
    if m.guide_dmin is not None:
        d = m.guide_dmin[sm]
        com = m.guide_committed[sm]
        live = com & (d < 1e8)
        q = np.percentile(d[live], [25, 50, 75]) if live.sum() else "—"
        print(f"  steered-fail committed-at-end {com.mean():.2f} | d_min "
              f"(closest committed approach to est, committed eps) "
              f"quartiles {q}")
        e = m.guide_est[sm]
        g = env.grid_size
        out = ((e < 0) | (e > g)).any(axis=-1)
        near = ((e < 15) | (e > g - 15)).any(axis=-1)
        print(f"  steered-fail est: outside grid {out.mean():.2f}, within "
              f"15px of edge or out {near.mean():.2f}")
if um.sum():
    e = m.guide_est[um]
    g = env.grid_size
    out = ((e < 0) | (e > g)).any(axis=-1)
    near = ((e < 15) | (e > g - 15)).any(axis=-1)
    print(f"  unsteered-fail est: outside grid {out.mean():.2f}, within "
          f"15px of edge or out {near.mean():.2f}")
if m.guide_dmin is not None and um.sum():
    com = m.guide_committed[um]
    print(f"  unsteered-fail committed-at-end {com.mean():.2f}")
hist = (np.histogram(m.guide_samples[um],
                     bins=[0, 1, 4, 8, 16, 32, 64, 10**6])[0]
        if um.sum() else [])
print("unsteered-failure sample-count histogram [0,1,4,8,16,32,64,inf):", hist)
