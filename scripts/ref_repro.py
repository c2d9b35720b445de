"""Reproduce the reference PPOV2.0 train+eval pipeline to settle its
57.0%-vs-21.7% success@40 dispute (PPOV2.0/READ.ME:32 vs :69).

Runs the reference's OWN code (imported from /root/reference/PPOV2.0 —
executed, not copied) for N seeds: 2000-episode training via its
train_ppo(), then a 1000-episode greedy eval with the identical protocol
as its evaluate_with_lstm.py main loop (argmax actions, fresh env,
success = deviation <= SUCCESS_DISTANCE_THRESHOLD=40).

The LSTM stop gate is intentionally absent: both of the reference's
committed eval transcripts show the gate never fired (early-stop rate
0.0% in run 2, NaN/no stop lines in run 1 — PPOV2.0/READ.ME:41,70), so
gate-off is exactly the protocol those numbers came from.

The reference is seedless; we seed numpy/torch/random per run to sample
the distribution its two committed runs were drawn from.

Usage:
  python scripts/ref_repro.py --all --seeds 5   # parent: loop seeds
  python scripts/ref_repro.py --seed 0          # child: one train+eval
Results: /root/repo/REF_REPRO.jsonl (one JSON line per seed).
"""
import argparse
import importlib.util
import json
import os
import pathlib
import random
import subprocess
import sys
import time

REF_DIR = "/root/reference/PPOV2.0"
SHIM_DIR = "/tmp/ref_shims"
WORK_ROOT = "/tmp/ref_repro"
OUT_PATH = "/root/repo/REF_REPRO.jsonl"


def write_shims():
    """Minimal stand-ins for gym and netCDF4 (absent from this image).

    gym: the reference only uses gym.Env as a base class and
    spaces.Discrete/Box as inert descriptors (environment.py:18-27).
    netCDF4: NetCDFWriter only needs a Dataset duck that swallows
    createDimension/createVariable/attr sets (netcdf_writer.py:18-118);
    the NC capture is irrelevant to the success@40 measurement.
    """
    gym_dir = pathlib.Path(SHIM_DIR) / "gym"
    gym_dir.mkdir(parents=True, exist_ok=True)
    (gym_dir / "__init__.py").write_text(
        "from . import spaces\n"
        "class Env:\n"
        "    metadata = {}\n"
    )
    (gym_dir / "spaces.py").write_text(
        "class Discrete:\n"
        "    def __init__(self, n):\n"
        "        self.n = n\n"
        "class Box:\n"
        "    def __init__(self, low=None, high=None, shape=None, dtype=None):\n"
        "        self.low, self.high, self.shape, self.dtype = low, high, shape, dtype\n"
    )
    (pathlib.Path(SHIM_DIR) / "netCDF4.py").write_text(
        "class _Var:\n"
        "    def __setitem__(self, k, v):\n"
        "        pass\n"
        "class Dataset:\n"
        "    def __init__(self, *a, **k):\n"
        "        pass\n"
        "    def createDimension(self, *a, **k):\n"
        "        pass\n"
        "    def createVariable(self, *a, **k):\n"
        "        return _Var()\n"
        "    def sync(self):\n"
        "        pass\n"
        "    def close(self):\n"
        "        pass\n"
    )


def run_seed(seed: int) -> dict:
    import numpy as np
    import torch

    torch.set_num_threads(1)
    random.seed(seed)
    np.random.seed(seed)
    torch.manual_seed(seed)

    workdir = pathlib.Path(WORK_ROOT) / f"seed{seed}"
    workdir.mkdir(parents=True, exist_ok=True)
    os.chdir(workdir)
    sys.path.insert(0, REF_DIR)

    t0 = time.time()
    spec = importlib.util.spec_from_file_location(
        "ref_train", os.path.join(REF_DIR, "train_ppo2.0.py"))
    ref_train = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_train)
    ref_train.train_ppo()
    train_secs = time.time() - t0

    # Training stats from the CSV the reference itself wrote.
    import pandas as pd
    df = pd.read_csv(workdir / "training_results1_4.csv")
    train_success = float(df["Success"].mean())
    final_radius = float(df["Current_Radius"].iloc[-1])

    # --- eval: the evaluate_with_lstm.py:70-110 protocol, gate-off ---
    from environment import MethaneEnv
    from model import PPOActorCritic
    from config import SUCCESS_DISTANCE_THRESHOLD

    model = PPOActorCritic(6, 5)
    model.load_state_dict(torch.load(workdir / "model/ppo_successful_models.pth"))
    model.eval()

    env = MethaneEnv()
    devs, steps_l = [], []
    t1 = time.time()
    for ep in range(1000):
        state = env.reset()
        done = False
        n_steps = 0
        while not done:
            with torch.no_grad():
                probs, _ = model(torch.FloatTensor(state).unsqueeze(0))
            action = int(torch.argmax(probs))
            state, _, done, _ = env.step(action)
            n_steps += 1
        devs.append(float(np.linalg.norm(env.agent_pos - env.source_pos)))
        steps_l.append(n_steps)
    eval_secs = time.time() - t1

    devs = np.asarray(devs)
    succ = devs <= SUCCESS_DISTANCE_THRESHOLD
    return {
        "seed": seed,
        "train_success_rate": train_success,
        "final_curriculum_radius": final_radius,
        "eval_success_at_40": float(succ.mean()),
        "eval_mean_deviation": float(devs.mean()),
        "eval_std_deviation": float(devs.std()),
        "eval_success_case_deviation": float(devs[succ].mean()) if succ.any() else None,
        "eval_mean_steps": float(np.mean(steps_l)),
        "train_secs": round(train_secs, 1),
        "eval_secs": round(eval_secs, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=None)
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--seeds", type=int, default=5)
    args = ap.parse_args()

    write_shims()
    if args.seed is not None:
        os.environ["PYTHONPATH"] = SHIM_DIR
        sys.path.insert(0, SHIM_DIR)
        res = run_seed(args.seed)
        with open(OUT_PATH, "a") as f:
            f.write(json.dumps(res) + "\n")
        print(json.dumps(res))
        return

    if args.all:
        for s in range(args.seeds):
            print(f"=== seed {s} ===", flush=True)
            env = dict(os.environ, PYTHONPATH=SHIM_DIR, JAX_PLATFORMS="cpu")
            subprocess.run(
                ["nice", "-n", "10", sys.executable, __file__, "--seed", str(s)],
                env=env, check=False)


if __name__ == "__main__":
    main()
