"""Per-episode loss accounting for the K=64 bank guide's guard_top residual.

The K=64 shipped recipe (guard_top 4) sits at 56.2% s@40 vs K=16's 75.8%
(RESULTS.md guard_top study).  This script replays the guided eval with
per-episode diagnostics and classifies every FAILING episode (dev > 40)
into the buckets the round-4 VERDICT asked for:

  wrong_match_dive   gated, identified row != true row (dove at a wrong
                     exact source)
  right_match_fail   gated on the right row but still failed (dive
                     execution: rim accidents / ran out of steps mid-dive)
  chord_death        never gated, episode TERMINATED early — the flight
                     crossed the true row's terminate ball before the
                     identity gate opened (split by whether any in-plume
                     evidence existed at death)
  gate_never_timeout never gated, ran to the step cap (split by contact:
                     contacted-but-unstable vs never-contacted)

CPU-forced so it can run while the TPU executes training arms; the same
classification on TPU metrics is a one-flag change.

Usage: python scripts/g64_accounting.py <ckpt_dir> [episodes] [seed] [K]
           [--arm guard_top4|guard_top4_m15|rim|none] [--tpu]
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import dataclasses  # noqa: E402

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from tpu_plume.core import get_preset  # noqa: E402
from tpu_plume.data.checkpoint import restore_checkpoint  # noqa: E402
from tpu_plume.evaluation import evaluate_policy  # noqa: E402
from tpu_plume.evaluation.bank_guide import make_bank_guide  # noqa: E402
from tpu_plume.fields import gridded  # noqa: E402
from tpu_plume.train.ppo_trainer import make_policy_model  # noqa: E402

ARMS = {
    "guard_top4": dict(guard_top=4),
    "guard_top4_m15": dict(guard_top=4, margin=1.5),
    "guard_top4_dive": dict(guard_top=4, dive_bias=True),
    "guard_top4_sticky": dict(guard_top=4, sticky_target=True),
    "guard_top4_sticky_dive": dict(guard_top=4, sticky_target=True,
                                   dive_bias=True),
    "guard_top4_search10": dict(guard_top=4, search_after=10),
    "guard_top4_sticky_search10": dict(guard_top=4, sticky_target=True,
                                       search_after=10),
    "rim": {},
    "rim_dive": dict(dive_bias=True),
    "none": dict(rim_guard=False),
    "none_dive": dict(rim_guard=False, dive_bias=True),
}


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    ckpt = args[0]
    n_eval = int(args[1]) if len(args) > 1 else 1000
    seed = int(args[2]) if len(args) > 2 else 0
    k_rows = int(args[3]) if len(args) > 3 else 64
    arm = "guard_top4"
    if "--arm" in sys.argv:
        arm = sys.argv[sys.argv.index("--arm") + 1]

    cfg = get_preset("wrf_les")
    cfg = cfg.replace(env=dataclasses.replace(
        cfg.env, plume_model="gridded", obs_memory=True,
        reward_variant="delta"))
    bank = gridded.maybe_pack(
        gridded.synthesize_bank(jax.random.PRNGKey(0), cfg.env,
                                num_fields=k_rows),
        cfg.env)
    model = make_policy_model(cfg)
    params = jax.tree.map(jnp.asarray, restore_checkpoint(ckpt)["params"])

    kw = dict(min_contact=2, check_every=1, search_after=50,
              rim_guard=True, rim_expire=400, terminate_radius=50.0,
              success_radius=cfg.eval.success_distance)
    kw.update(ARMS[arm])
    guide = make_bank_guide(cfg.env, k_rows, **kw)
    m = evaluate_policy(
        params, model.apply, cfg.env, cfg.eval, jax.random.PRNGKey(seed),
        num_episodes=n_eval, greedy=True, guide=guide, bank=bank,
    )

    dev = np.asarray(m.deviations)
    steps = np.asarray(m.steps)
    gated = np.asarray(m.guide_fit_ok).astype(bool)
    match = np.asarray(m.guide_match)
    idx = np.asarray(m.field_idx)
    contacts = np.asarray(m.guide_contacts)
    max_steps = min(cfg.env.max_steps, cfg.eval.max_eval_steps)

    fail = dev > cfg.eval.success_distance
    timeout = steps >= max_steps
    right = match == idx

    buckets = {
        "wrong_match_dive": fail & gated & ~right,
        "right_match_fail": fail & gated & right,
        "chord_death_contacted": fail & ~gated & ~timeout & (contacts >= 1),
        "chord_death_blind": fail & ~gated & ~timeout & (contacts == 0),
        "timeout_contacted": fail & ~gated & timeout & (contacts >= 2),
        "timeout_thin_contact": fail & ~gated & timeout & (contacts == 1),
        "timeout_never_contact": fail & ~gated & timeout & (contacts == 0),
    }
    out = {
        "arm": arm, "episodes": n_eval, "seed": seed, "K": k_rows,
        "s40": float((~fail).mean()),
        "gate_rate": float(gated.mean()),
        "match_accuracy": float(right[gated].mean()) if gated.any() else 0.0,
        "mean_steps": float(steps.mean()),
        "fail_total": int(fail.sum()),
    }
    for name, mask in buckets.items():
        out[name] = int(mask.sum())
        if mask.any():
            out[name + "_meandev"] = round(float(dev[mask].mean()), 1)
            out[name + "_meansteps"] = round(float(steps[mask].mean()), 1)
    # sanity: buckets partition the failures
    total = sum(int(mask.sum()) for mask in buckets.values())
    out["bucket_coverage"] = total == int(fail.sum())
    # success-side context: how do WINS happen?
    win = ~fail
    out["win_gated_right"] = int((win & gated & right).sum())
    out["win_gated_wrong"] = int((win & gated & ~right).sum())
    out["win_ungated_chord"] = int((win & ~gated).sum())
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
