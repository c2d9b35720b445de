"""Why does the trilateration guide validate in only ~54% of episodes?

Runs a guided eval (CPU-forced; usable while the TPU runs training arms),
saves flight trajectories, then REPLAYS the guide offline over each flight
to classify every non-validated hover episode by the gate that failed at
its last in-plume step: too-few-inliers, posterior-se (geometry), radial
residual (noise), or the fit-vs-pointwise cross-check.  The replay is exact
because the guide's sample buffer is a pure function of the executed
(pos, conc) sequence, which the trajectory records.

Usage: python scripts/guide_diag.py <ckpt_dir> [episodes]
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
    _solve_estimate,
    derive_guide_config,
    guide_init,
    guide_step,
    make_guide,
)
from tpu_plume.train.ppo_trainer import make_policy_model  # noqa: E402


def main():
    ckpt = sys.argv[1]
    n_eval = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    cfg = get_preset("ppo_v2_0")
    cfg = cfg.replace(env=dataclasses.replace(
        cfg.env, obs_memory=True, reward_variant="delta"))
    model = make_policy_model(cfg)
    params = jax.tree.map(jnp.asarray, restore_checkpoint(ckpt)["params"])

    gcfg = dataclasses.replace(
        derive_guide_config(cfg.env, 50.0, cfg.eval.success_distance),
        fallback_patience=0)
    guide = make_guide(cfg.env, gcfg=gcfg)
    m = evaluate_policy(
        params, model.apply, cfg.env, cfg.eval, jax.random.PRNGKey(0),
        num_episodes=n_eval, greedy=True, guide=guide,
        track_trajectories=n_eval,
    )
    succ = float(np.mean(m.success))
    print(json.dumps(dict(
        success_rate=succ,
        mean_dev=float(np.mean(m.deviations)),
        hover_rate=float(np.mean(m.guide_hover)),
        fit_ok_rate=float(np.mean(m.guide_fit_ok)),
        mean_steps=float(np.mean(m.steps)),
    )))

    # ---- offline replay with per-step gate diagnostics -----------------
    traj = np.asarray(m.trajectories)      # [K, T, 3] NaN past end
    src = np.asarray(m.sources)            # [K, 2]
    valid = ~np.isnan(traj[..., 0])        # [K, T]

    def replay(ep_traj, ep_valid):
        def step_fn(gs, inp):
            pos, conc, v = inp
            gs2, _act, _ov = guide_step(
                gs, pos, conc, jnp.int32(0), cfg.env, gcfg)
            gs2 = jax.tree.map(lambda a, b: jnp.where(v, a, b), gs2, gs)
            est, ok_base, se, n_eff = _solve_estimate(gs2, gcfg)
            # reconstruct the cross-check at this cell
            noise_mean = cfg.env.turbulence_intensity * (0.7978845608 + 0.1)
            conc_n = (conc - noise_mean) / cfg.env.conc_peak
            r2 = -2.0 * cfg.env.plume_sigma**2 * jnp.log(
                jnp.maximum(conc_n, 1e-6))
            d_est = jnp.linalg.norm(pos[:2] - est)
            xok = jnp.where(conc_n >= gcfg.cross_check_conc,
                            jnp.abs(d_est - jnp.sqrt(jnp.maximum(r2, 0.0)))
                            <= gcfg.cross_check_tol, True)
            # which hover branch chose this step's action: probe-in, or
            # rally (no trusted read), or the out/bounce heuristic
            noise_mean2 = cfg.env.turbulence_intensity * (0.7978845608 + 0.1)
            cn = (conc - noise_mean2) / cfg.env.conc_peak
            d_pt = jnp.sqrt(jnp.maximum(
                -2.0 * cfg.env.plume_sigma**2 * jnp.log(
                    jnp.maximum(cn, 1e-6)), 0.0))
            have = cn >= gcfg.point_floor
            rec = dict(se=se, n_eff=n_eff, ok=ok_base & xok,
                       ok_base=ok_base, xok=xok, hover=gs2.mode == 1,
                       est=est, count=gs2.count, committed=gs2.committed,
                       probe=have & (d_pt >= gcfg.probe_in_min),
                       rally=~have, d_pt=d_pt)
            return gs2, rec
        pos = ep_traj[:, :2]
        conc = jnp.nan_to_num(ep_traj[:, 2])
        pos = jnp.nan_to_num(pos)
        _, recs = jax.lax.scan(step_fn, guide_init(gcfg),
                               (pos, conc, ep_valid))
        return recs

    recs = jax.jit(jax.vmap(replay))(jnp.asarray(traj), jnp.asarray(valid))
    recs = jax.tree.map(np.asarray, recs)

    T = traj.shape[1]
    last = np.maximum(valid.sum(1) - 1, 0)               # [K] last step idx
    ar = np.arange(len(last))
    f_se = recs["se"][ar, last]
    f_n = recs["n_eff"][ar, last]
    f_ok = recs["ok"][ar, last]
    f_okb = recs["ok_base"][ar, last]
    f_x = recs["xok"][ar, last]
    f_cnt = recs["count"][ar, last]
    ever_hover = recs["hover"].any(1)
    ever_ok = recs["ok"].any(1)
    est_err = np.linalg.norm(recs["est"][ar, last] - src, axis=-1)
    timeout = valid.sum(1) >= T
    dev = np.asarray(m.deviations)

    def stat(mask, name):
        if mask.sum() == 0:
            print(f"{name}: 0")
            return
        print(f"{name}: n={int(mask.sum())} ({mask.mean():.1%})  "
              f"s@40={np.mean(dev[mask] <= 40):.1%}  "
              f"dev={np.mean(dev[mask]):.1f}  "
              f"se_med={np.median(f_se[mask]):.1f}  "
              f"n_eff_med={np.median(f_n[mask]):.0f}  "
              f"samples_med={np.median(f_cnt[mask]):.0f}  "
              f"est_err_med={np.median(est_err[mask]):.1f}  "
              f"timeout={np.mean(timeout[mask]):.1%}")

    print("\n-- episode classes (final in-plume step gates) --")
    stat(f_ok, "fit VALIDATED at end")
    stat(ever_ok & ~f_ok, "validated then LOST")
    nv = ~ever_ok
    stat(nv & ~ever_hover, "never hovered (no contact)")
    h = nv & ever_hover
    stat(h & (f_n < gcfg.min_samples), "hover, too few inliers")
    enough = h & (f_n >= gcfg.min_samples)
    stat(enough & (f_se > gcfg.max_se), "hover, se gate (geometry)")
    stat(enough & (f_se <= gcfg.max_se) & ~f_okb, "hover, residual gate")
    stat(enough & f_okb & ~f_x, "hover, cross-check kill")
    print("\n-- se distribution at final step, non-validated hover —")
    if h.sum():
        q = np.percentile(f_se[h], [10, 25, 50, 75, 90])
        print("se pct [10,25,50,75,90]:", np.round(q, 1),
              f"(gate {gcfg.max_se})")
        qq = np.percentile(f_cnt[h], [10, 50, 90])
        print("accepted samples pct [10,50,90]:", qq)

    # ---- episode end-cause classes under the commit latch --------------
    cm = recs["committed"]
    f_commit = cm[ar, last]
    first_commit = np.where(cm.any(1), cm.argmax(1), 10**9)
    steps_after = valid.sum(1) - 1 - first_commit   # only valid if committed
    crossed = ~timeout
    hov_end = recs["hover"][ar, last]
    print("\n-- end causes (latch arm) --")
    stat(crossed & f_commit, "crossed after COMMIT (dive)")
    stat(crossed & ~f_commit & hov_end, "crossed in hover (accident)")
    acc = crossed & ~f_commit & hov_end
    # classify the accident's FINAL step by the branch that chose it:
    # the recorded fields are at the landing step; the branch that moved
    # there is the previous step's
    prev = np.maximum(last - 1, 0)
    a_probe = recs["probe"][ar, prev]
    a_rally = recs["rally"][ar, prev]
    stat(acc & a_probe, "  accident via in-probe (spike-baited)")
    stat(acc & a_rally, "  accident via rally (no trusted read)")
    stat(acc & ~a_probe & ~a_rally, "  accident via out/bounce step")
    if acc.sum():
        print("  d_pt at step before accident: pct[10,50,90] =",
              np.round(np.percentile(recs["d_pt"][ar, prev][acc],
                                     [10, 50, 90]), 1))
    stat(crossed & ~f_commit & ~hov_end, "crossed under policy")
    stat(timeout, "timed out")
    c = crossed & f_commit
    if c.sum():
        sa = steps_after[c]
        for lo, hi in [(0, 2), (2, 8), (8, 30), (30, 10**9)]:
            mm = c.copy()
            mm[c] = (sa >= lo) & (sa < hi)
            stat(mm, f"  dive, {lo}<=steps-after-commit<{hi}")


if __name__ == "__main__":
    main()
