"""Identifiability-triggered ridge-ride A/B on the wrf anisotropic physics
(round-3 VERDICT next-step #3).

Arms (same checkpoint, seeds, protocol):
  control    — shipped Gauss-Newton guide (ride off)
  ride-se    — ride whenever the fit has samples but has not validated
               (ride_ambig_min=0: the se-gated trigger)
  ride-ambig — ride only when the multi-start mode spread exceeds 40 px
               within a 5x noise-floored loss band

Two protocols per arm: reference radius-50 greedy s@40, and the
precision radius-5 bullseye (the 76.8 +- 1.2 plateau under attack).

Usage: python scripts/ride_ab.py <ckpt_dir> [episodes] [seed] [arms]
"""
from __future__ import annotations

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from tpu_plume.core import get_preset  # noqa: E402
from tpu_plume.data.checkpoint import restore_checkpoint  # noqa: E402
from tpu_plume.evaluation import evaluate_policy  # noqa: E402
from tpu_plume.evaluation.aniso_fit import (  # noqa: E402
    derive_aniso_config,
    make_aniso_guide,
)
from tpu_plume.train.ppo_trainer import make_policy_model  # noqa: E402

ARMS = {
    "control": {},
    "ride-se": dict(ride=True, ride_ambig_min=0.0),
    "ride-ambig": dict(ride=True, ride_ambig_min=40.0),
    # dive-jitter damping ported from the isotropic guide (round 4)
    "ema02": dict(est_ema=0.2),
    "ema05": dict(est_ema=0.5),
    # resuming serpentine contact search ported from the bank guide
    # (round 4: the guided loss pool is contact-limited — 46.5% of
    # episodes fail with median 5 usable samples)
    "search25": dict(search_after=25),
    "search50": dict(search_after=50),
    "search100": dict(search_after=100),
}


def main():
    ckpt = sys.argv[1]
    n_eval = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    arms = sys.argv[4].split(",") if len(sys.argv) > 4 else list(ARMS)

    cfg = get_preset("wrf_les")
    cfg = cfg.replace(env=dataclasses.replace(
        cfg.env, obs_memory=True, reward_variant="delta",
        inplume_bonus=0.2))
    model = make_policy_model(cfg)
    params = jax.tree.map(jnp.asarray, restore_checkpoint(ckpt)["params"])

    for name in arms:
        kw = ARMS[name]
        for proto, radius, greedy in (("r50", None, True), ("r5", 5.0, False)):
            base = derive_aniso_config(
                cfg.env,
                terminate_radius=50.0 if radius is None else radius,
                success_radius=cfg.eval.success_distance,
            )
            gcfg = dataclasses.replace(base, **kw)
            m = evaluate_policy(
                params, model.apply, cfg.env, cfg.eval,
                jax.random.PRNGKey(seed), num_episodes=n_eval,
                greedy=greedy, goal_radius=radius,
                guide=make_aniso_guide(cfg.env, gcfg=gcfg),
            )
            dev = np.asarray(m.deviations)
            out = dict(
                arm=name, proto=proto,
                s40=float(np.mean(dev <= 40.0)),
                mean_steps=float(np.mean(m.steps)),
                timeout=float(np.mean(np.asarray(m.steps) >= 1000)),
            )
            if radius is not None:
                out["bullseye"] = float(np.mean(dev <= radius))
            print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
