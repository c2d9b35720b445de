"""Round-5 eval-side A/B drivers (provenance for RESULTS.md sections:
seed-probe selection, LES evidence A/B, deadline-margin wide validation,
K=64 deadline-length coda).  Each block is idempotent (skips jobs whose
log already holds a result line) and runs IN-PROCESS against the real
TPU — one client for the whole batch, per the cross-process tunnel-wedge
gotcha in CLAUDE.md.

Usage: python scripts/r5_guide_abs.py [probe100|les_margin|mu_wide|g64_mu]...
"""
from __future__ import annotations

import contextlib
import importlib
import os
import shlex
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tpu_plume.cli.main import main as cli_main  # noqa: E402

R = "/root/runs"


def _eval(argv: str, lf: str):
    if os.path.exists(lf) and "success_rate" in open(lf).read():
        return
    print("job", lf, flush=True)
    with open(lf, "w") as fh, contextlib.redirect_stdout(fh):
        cli_main(shlex.split(argv))


LES = (f"eval --preset wrf_les --plume-model gridded --bank {R}/les_bank.nc "
       "--reward delta --obs-memory --envs 512 --unroll 64 "
       "--minibatch 4096 --lr 1e-4 --episodes 1000 --seed 0 --guide bank")
G16 = ("eval --preset wrf_les --plume-model gridded --synth-bank static "
       "--bank-fields 16 --reward delta --obs-memory --envs 512 --unroll 64 "
       "--minibatch 4096 --lr 1e-4 --episodes 1000 --seed 0 --guide bank")
G64 = (G16.replace("--bank-fields 16", "--bank-fields 64")
       + " --guide-guard-top 4")


def probe100():
    """100-episode seed probes on the six wrf seed-band checkpoints
    (ranking vs the 1000-episode truth — RESULTS.md seed-probe study)."""
    import ride_ab
    for name in ("ip02", "nb"):
        for s in (0, 1, 2):
            sys.argv = ["ride_ab.py",
                        f"{R}/wrf_{name}_s{s}/checkpoint", "100", "0",
                        "control"]
            print(f"### {name} s{s}", flush=True)
            importlib.reload(ride_ab)
            ride_ab.main()


def les_margin():
    """Hard-margin / early-search arms on les16_s1 (all negative) plus
    the deadline-margin arms that motivated the new default."""
    ck = f"--ckpt {R}/les16_s1/checkpoint"
    for tag, extra in (
            ("m13", "--guide-margin 1.3 --guide-margin-until 0"),
            ("m15", "--guide-margin 1.5 --guide-margin-until 0"),
            ("s25", "--guide-search-after 25"),
            ("mu250", "--guide-margin 1.5 --guide-margin-until 250"),
            ("mu400", "--guide-margin 1.5 --guide-margin-until 400")):
        _eval(f"{LES} {ck} {extra}", f"{R}/les_ab_{tag}.log")


def mu_wide():
    """Deadline-margin (1.5 / 400) across LES seeds + on-family banks."""
    mu = "--guide-margin 1.5 --guide-margin-until 400"
    for s in (0, 2):
        _eval(f"{LES} {mu} --ckpt {R}/les16_s{s}/checkpoint",
              f"{R}/mu_les_s{s}.log")
    for s in (0, 1, 2):
        _eval(f"{G16} {mu} --ckpt {R}/grid16b_s{s}/checkpoint",
              f"{R}/mu_g16_s{s}.log")
    _eval(f"{G64} {mu} --ckpt {R}/grid64b_s0/checkpoint",
          f"{R}/mu_g64_s0.log")


def g64_mu():
    """K=64 deadline-length coda (episodes average 137 steps, so 400
    never releases; 100/150 measured — all neutral)."""
    for tag, mu in (("mu100", 100), ("mu150", 150)):
        _eval(f"{G64} --guide-margin 1.5 --guide-margin-until {mu} "
              f"--ckpt {R}/grid64b_s0/checkpoint",
              f"{R}/mu_g64_{tag}.log")


if __name__ == "__main__":
    for mode in (sys.argv[1:] or ["probe100", "les_margin", "mu_wide",
                                  "g64_mu"]):
        {"probe100": probe100, "les_margin": les_margin,
         "mu_wide": mu_wide, "g64_mu": g64_mu}[mode]()
