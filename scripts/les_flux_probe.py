"""Model-mismatch probe for the flux front end (round-5 VERDICT #3).

The flux pipeline's position estimator (``estimate_sources``: conc^3 EM +
log-Gaussian refinement + residual reseat + joint mixture LM) is built on
the isotropic-Gaussian kernel.  This probe runs the SAME estimator over
raster-survey samples of (a) the analytic isotropic field it assumes and
(b) the LES-surrogate bank (meandering intermittent puffs, linear width
growth) — quantifying how far the model-based front end degrades off its
model family.  Strength truth does not exist for the surrogate (fields
are max-normalized), so the robustness number is POSITION error — the
quantity every downstream inversion inherits.

CPU-forced; usable while the TPU trains.  Usage:
    python scripts/les_flux_probe.py [episodes_per_row]
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import dataclasses  # noqa: E402

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from tpu_plume.core import get_preset  # noqa: E402
from tpu_plume.evaluation.flux import estimate_sources  # noqa: E402
from tpu_plume.fields import gridded  # noqa: E402


def raster_track(cfg, start_y: float, n_steps: int) -> np.ndarray:
    """Deterministic serpentine sample track (the raster oracle's path,
    host-side): descend to y=0 then sweep upward in 1.12-sigma bands."""
    g, m = cfg.grid_size, cfg.move_step
    band = 1.12 * cfg.plume_sigma
    pts = []
    x, y = g / 2.0, start_y
    for _ in range(int(g / m)):
        y = max(y - m, 0.0)
        pts.append((x, y))
    going_right = True
    while len(pts) < n_steps:
        if going_right and x >= g - 1.2 * m or (not going_right) and x <= 1.2 * m:
            y = min(y + band, g - 1)
            going_right = not going_right
        else:
            x = x + m if going_right else x - m
        pts.append((x, y))
    return np.asarray(pts[:n_steps], np.float32)


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    cfg = dataclasses.replace(get_preset("wrf_les").env, plume_model="gridded")
    iso_cfg = get_preset("ppo_v2_0").env
    key = jax.random.PRNGKey(0)
    bank = gridded.synthesize_les_bank(key, cfg, num_fields=16, num_frames=16)
    rng = np.random.default_rng(0)
    n_steps = 500

    out = {}
    K = bank.conc.shape[0]
    for family in ("isotropic", "les"):
        errs, perrs, berrs, bmatch = [], [], [], []
        for k in range(bank.conc.shape[0]):
            for r in range(reps):
                pts = raster_track(iso_cfg, float(rng.uniform(0, 499)), n_steps)
                t = np.arange(n_steps, dtype=np.float32)
                if family == "les":
                    src = np.asarray(bank.source[k])
                    ij = np.clip(np.floor(pts).astype(np.int32), 0, 499)
                    concs = np.asarray(gridded.sample_bank(
                        bank, jnp.full(n_steps, k, jnp.int32),
                        jnp.asarray(ij[:, 0]), jnp.asarray(ij[:, 1]),
                        t=jnp.asarray(t),
                    ))
                else:
                    src = np.asarray(
                        rng.uniform(iso_cfg.source_padding,
                                    iso_cfg.grid_size - iso_cfg.source_padding,
                                    2), np.float32)
                    d2 = ((pts - src[None]) ** 2).sum(-1)
                    concs = iso_cfg.conc_peak * np.exp(
                        -d2 / (2 * iso_cfg.plume_sigma ** 2))
                # the env's additive turbulence noise (same law both arms)
                noise = iso_cfg.turbulence_intensity * (
                    np.abs(rng.normal(size=n_steps)) + 0.2 * rng.uniform(size=n_steps))
                concs = np.clip(concs + noise, 0, iso_cfg.conc_peak)
                est = np.asarray(estimate_sources(
                    jnp.asarray(pts), jnp.asarray(concs, jnp.float32), 1,
                    iso_cfg))[0]
                errs.append(float(np.linalg.norm(est - src)))
                # model-free control: the single strongest sample's
                # position — separates "the estimator's physics model is
                # wrong" from "the samples hold no source information"
                peak = pts[int(np.argmax(concs))]
                perrs.append(float(np.linalg.norm(peak - src)))
                if family == "les":
                    # the recommended off-family route: identify the bank
                    # ROW from the survey samples (the bank guide's scorer
                    # semantics — informative-step squared prediction
                    # error incl. negative evidence), read off its source
                    preds = np.asarray(gridded.sample_bank(
                        bank,
                        jnp.repeat(jnp.arange(K, dtype=jnp.int32), n_steps),
                        jnp.tile(jnp.asarray(ij[:, 0]), K),
                        jnp.tile(jnp.asarray(ij[:, 1]), K),
                        t=jnp.tile(jnp.asarray(t), K),
                    )).reshape(K, n_steps)
                    floor = 3.0 * iso_cfg.turbulence_intensity
                    informative = (concs[None] >= floor) | (preds >= floor)
                    score = (informative * (concs[None] - preds) ** 2).sum(1)
                    kb = int(np.argmin(score))
                    bmatch.append(kb == k)
                    berrs.append(float(np.linalg.norm(
                        np.asarray(bank.source[kb]) - src)))
        errs, perrs = np.asarray(errs), np.asarray(perrs)
        out[family] = {
            "n": len(errs),
            "median_pos_err": round(float(np.median(errs)), 1),
            "mean_pos_err": round(float(errs.mean()), 1),
            "p90_pos_err": round(float(np.quantile(errs, 0.9)), 1),
            "within_20px": round(float((errs <= 20).mean()), 3),
            "within_40px": round(float((errs <= 40).mean()), 3),
            "peak_sample_median_err": round(float(np.median(perrs)), 1),
            "peak_sample_within_40px": round(float((perrs <= 40).mean()), 3),
        }
        if berrs:
            b = np.asarray(berrs)
            out[family]["bank_match_median_err"] = round(float(np.median(b)), 1)
            out[family]["bank_match_within_20px"] = round(float((b <= 20).mean()), 3)
            out[family]["bank_match_accuracy"] = round(float(np.mean(bmatch)), 3)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
