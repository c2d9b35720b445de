"""Round-5 consolidated TPU session: every remaining train/eval stage in
ONE long-lived process.

Why: the axon tunnel wedged three times this session at CLIENT STARTUP
(fresh `cli train` processes sitting at ~0 CPU forever, even with cached
programs and 60 s gaps — see CLAUDE.md).  Library calls inside one
process hit the device without new client handshakes, so the per-job
wedge risk collapses to one.  Every stage is idempotent (skipped when
its output exists), so a restart of this script resumes.

CPU-only stages (localizer training) go through `--cpu` SUBPROCESSES —
forcing the CPU platform in-process would flip the global JAX config.

Usage: python scripts/r5_tpu_master.py [--stages seedband,les,phasec]
"""
from __future__ import annotations

import contextlib
import os
import shlex
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpu_plume.cli.main import main as cli_main  # noqa: E402

R = "/root/runs"


def log(msg):
    print(f"[master {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def run_cli(argv: str, logfile: str):
    log(f"cli {argv} -> {logfile}")
    with open(logfile, "w") as fh, contextlib.redirect_stdout(fh):
        cli_main(shlex.split(argv))


def run_ride(ckpt: str, logfile: str):
    """ride_ab's control arm (both protocols) in-process."""
    import importlib

    log(f"ride_ab {ckpt} -> {logfile}")
    sys.argv = ["ride_ab.py", ckpt, "1000", "0", "control"]
    import ride_ab  # noqa: F401  (scripts/ on sys.path via __file__ dir)

    importlib.reload(ride_ab)
    with open(logfile, "w") as fh, contextlib.redirect_stdout(fh):
        ride_ab.main()


def done(path):
    return os.path.exists(path)


def stage_seedband():
    rec = ("--preset wrf_les --reward delta --obs-memory --envs 512 "
           "--unroll 64 --minibatch 4096 --lr 1e-4 --no-csv "
           "--episodes 400000")
    for s in (0, 1, 2):
        for name, extra in (("ip02", "--inplume-bonus 0.2"), ("nb", "")):
            out = f"{R}/wrf_{name}_s{s}"
            if not done(f"{out}/checkpoint"):
                run_cli(f"train {rec} {extra} --seed {s} --out {out}",
                        f"{R}/sb_train_{name}_s{s}.log")
    for s in (0, 1, 2):
        for name in ("ip02", "nb"):
            lf = f"{R}/sb_eval_{name}_s{s}.log"
            if not (done(lf) and "bullseye" in open(lf).read()):
                run_ride(f"{R}/wrf_{name}_s{s}/checkpoint", lf)
    open(f"{R}/seedband.done", "w").write("DONE\n")


def stage_grid16():
    """K=16 bank-guide training-seed band (VERDICT #2, second half):
    the 75.8% headline is one training seed (grid16b_s0)."""
    rec = ("--preset wrf_les --plume-model gridded --synth-bank static "
           "--bank-fields 16 --reward delta --obs-memory --envs 512 "
           "--unroll 64 --minibatch 4096 --lr 1e-4")
    for s in (0, 1, 2):
        out = f"{R}/grid16b_s{s}"
        if not done(f"{out}/checkpoint"):
            run_cli(f"train {rec} --inplume-bonus 0.2 --seed {s} "
                    f"--episodes 400000 --no-csv --out {out}",
                    f"{R}/g16sb_train_s{s}.log")
        lf = f"{R}/g16sb_eval_s{s}.log"
        if not (done(lf) and "s@40" in open(lf).read()):
            run_cli(f"eval {rec} --ckpt {out}/checkpoint --episodes 1000 "
                    "--seed 0 --guide bank", lf)
    open(f"{R}/grid16.done", "w").write("DONE\n")


def stage_les():
    if not done(f"{R}/les_bank.nc"):
        import dataclasses

        import jax

        from tpu_plume.core import get_preset
        from tpu_plume.fields import gridded

        cfg = dataclasses.replace(get_preset("wrf_les").env,
                                  plume_model="gridded")
        bank = gridded.synthesize_les_bank(
            jax.random.PRNGKey(0), cfg, num_fields=16, num_frames=16)
        gridded.export_bank_netcdf(bank, f"{R}/les_bank.nc")
        log(f"exported les bank {bank.conc.shape}")
    rec = (f"--preset wrf_les --plume-model gridded --bank {R}/les_bank.nc "
           "--reward delta --obs-memory --envs 512 --unroll 64 "
           "--minibatch 4096 --lr 1e-4")
    if not done(f"{R}/les16_s0/checkpoint"):
        run_cli(f"train {rec} --inplume-bonus 0.2 --seed 0 "
                f"--episodes 400000 --no-csv --out {R}/les16_s0",
                f"{R}/les_train.log")
    if not done(f"{R}/les_flights.npz"):
        run_cli(f"eval {rec} --ckpt {R}/les16_s0/checkpoint --episodes 1000 "
                f"--seed 0 --save-flights {R}/les_flights.npz",
                f"{R}/les_plain.log")
    if not done(f"{R}/les_bankguide.log"):
        run_cli(f"eval {rec} --ckpt {R}/les16_s0/checkpoint --episodes 1000 "
                "--seed 0 --guide bank", f"{R}/les_bankguide.log")
    if not done(f"{R}/les_loc/localizer_meta.npz"):
        # CPU-forced: subprocess so the in-process platform stays TPU
        log("localizer train (cpu subprocess)")
        subprocess.run(
            [sys.executable, "-m", "tpu_plume.cli", "train-lstm",
             "--variant", "params", "--cpu", "--flights",
             f"{R}/les_flights.npz", "--window", "64", "--epochs", "100",
             "--features", "xycd", "--hidden-size", "64",
             "--out", f"{R}/les_loc"],
            stdout=open(f"{R}/les_loc.log", "w"),
            stderr=subprocess.STDOUT, cwd="/root/repo", check=True)
    if not done(f"{R}/les_learned.log"):
        run_cli(f"eval {rec} --ckpt {R}/les16_s0/checkpoint --episodes 1000 "
                f"--seed 0 --guide learned --guide-ckpt "
                f"{R}/les_loc/gaussian_params", f"{R}/les_learned.log")
    open(f"{R}/les.done", "w").write("DONE\n")


def stage_les_band():
    """LES robustness training-seed band: the 53.7% bank-guide row and
    28.4% plain row are single-seed; repeat at seeds 1/2."""
    rec = (f"--preset wrf_les --plume-model gridded --bank {R}/les_bank.nc "
           "--reward delta --obs-memory --envs 512 --unroll 64 "
           "--minibatch 4096 --lr 1e-4")
    for s in (1, 2):
        out = f"{R}/les16_s{s}"
        if not done(f"{out}/checkpoint"):
            run_cli(f"train {rec} --inplume-bonus 0.2 --seed {s} "
                    f"--episodes 400000 --no-csv --out {out}",
                    f"{R}/lesb_train_s{s}.log")
        for guide, lf in (("", f"{R}/lesb_plain_s{s}.log"),
                          ("--guide bank", f"{R}/lesb_bank_s{s}.log")):
            if not (done(lf) and "success_rate" in open(lf).read()):
                run_cli(f"eval {rec} --ckpt {out}/checkpoint --episodes 1000 "
                        f"--seed 0 {guide}", lf)
    open(f"{R}/les_band.done", "w").write("DONE\n")


def stage_phasec():
    wrec = ("--preset wrf_les --reward delta --obs-memory --envs 512 "
            "--unroll 64 --minibatch 4096 --lr 1e-4 --no-csv "
            "--episodes 400000")
    if not done(f"{R}/wrf_ip02bfh_s0/checkpoint"):
        run_cli(f"train {wrec} --inplume-bonus 0.2 --seed 0 --bf16-update "
                f"--f32-heads --out {R}/wrf_ip02bfh_s0", f"{R}/c1_train.log")
    if not done(f"{R}/c1_eval.log"):
        run_ride(f"{R}/wrf_ip02bfh_s0/checkpoint", f"{R}/c1_eval.log")

    irec = ("--preset ppo_v2_0 --reward delta --obs-memory --envs 512 "
            "--unroll 64 --minibatch 4096 --lr 1e-4 --no-csv")
    ieval = ("eval --preset ppo_v2_0 --reward delta --obs-memory "
             "--episodes 1000 --seed 0 --guide fit")
    if not done(f"{R}/iso_s0/checkpoint"):
        run_cli(f"train {irec} --seed 0 --episodes 300000 --out {R}/iso_s0",
                f"{R}/c2_train.log")
    if not done(f"{R}/c2_base.log"):
        run_cli(f"{ieval} --ckpt {R}/iso_s0/checkpoint", f"{R}/c2_base.log")
    if not done(f"{R}/iso_gft/checkpoint"):
        run_cli(f"train {irec} --seed 0 --episodes 100000 "
                f"--ckpt {R}/iso_s0/checkpoint --train-guide fit "
                f"--min-radius 50 --terminal-gate 40 --out {R}/iso_gft",
                f"{R}/c2_gft_train.log")
    if not done(f"{R}/iso_ctl/checkpoint"):
        run_cli(f"train {irec} --seed 0 --episodes 100000 "
                f"--ckpt {R}/iso_s0/checkpoint --min-radius 50 "
                f"--terminal-gate 40 --out {R}/iso_ctl",
                f"{R}/c2_ctl_train.log")
    if not done(f"{R}/c2_gft_eval.log"):
        run_cli(f"{ieval} --ckpt {R}/iso_gft/checkpoint",
                f"{R}/c2_gft_eval.log")
    if not done(f"{R}/c2_ctl_eval.log"):
        run_cli(f"{ieval} --ckpt {R}/iso_ctl/checkpoint",
                f"{R}/c2_ctl_eval.log")
    open(f"{R}/phasec.done", "w").write("DONE\n")


def stage_c1band():
    """bf16-update+f32-heads seeds 1/2: is C1's r50=43.9 seed noise?"""
    wrec = ("--preset wrf_les --reward delta --obs-memory --envs 512 "
            "--unroll 64 --minibatch 4096 --lr 1e-4 --no-csv "
            "--episodes 400000")
    for s in (1, 2):
        out = f"{R}/wrf_ip02bfh_s{s}"
        if not done(f"{out}/checkpoint"):
            run_cli(f"train {wrec} --inplume-bonus 0.2 --seed {s} "
                    f"--bf16-update --f32-heads --out {out}",
                    f"{R}/c1b_train_s{s}.log")
        lf = f"{R}/c1b_eval_s{s}.log"
        if not (done(lf) and "bullseye" in open(lf).read()):
            run_ride(f"{out}/checkpoint", lf)
    open(f"{R}/c1band.done", "w").write("DONE\n")


def stage_g64band():
    """K=64 guard_top training-seed band (the 56.2 row is single-seed)."""
    rec = ("--preset wrf_les --plume-model gridded --synth-bank static "
           "--bank-fields 64 --reward delta --obs-memory --envs 512 "
           "--unroll 64 --minibatch 4096 --lr 1e-4")
    for s in (0, 1, 2):
        out = f"{R}/grid64b_s{s}"
        if not done(f"{out}/checkpoint"):
            run_cli(f"train {rec} --inplume-bonus 0.2 --seed {s} "
                    f"--episodes 400000 --no-csv --out {out}",
                    f"{R}/g64sb_train_s{s}.log")
        lf = f"{R}/g64sb_eval_s{s}.log"
        if not (done(lf) and "success_rate" in open(lf).read()):
            run_cli(f"eval {rec} --ckpt {out}/checkpoint --episodes 1000 "
                    "--seed 0 --guide bank --guide-guard-top 4", lf)
    open(f"{R}/g64band.done", "w").write("DONE\n")


def stage_isobull():
    """Fresh-container reproduction of the 97.2% iso bullseye headline."""
    lf = f"{R}/iso_bullseye.log"
    if not (done(lf) and "success_rate" in open(lf).read()):
        run_cli("eval --preset ppo_v2_0 --reward delta --obs-memory "
                f"--ckpt {R}/iso_s0/checkpoint --episodes 1000 --seed 0 "
                "--guide fit --goal-radius 5 --sample", lf)
    open(f"{R}/isobull.done", "w").write("DONE\n")


def main():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    stages = "seedband,grid16,les,phasec"
    if "--stages" in sys.argv:
        stages = sys.argv[sys.argv.index("--stages") + 1]
    for s in stages.split(","):
        log(f"=== stage {s}")
        {"seedband": stage_seedband, "grid16": stage_grid16,
         "les": stage_les, "les_band": stage_les_band,
         "phasec": stage_phasec, "c1band": stage_c1band,
         "g64band": stage_g64band, "isobull": stage_isobull}[s]()
        log(f"=== stage {s} complete")
    log("ALL DONE")


if __name__ == "__main__":
    main()
