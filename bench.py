"""tpu-plume benchmark.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Primary metric (BASELINE.json): env steps/sec at 4096 parallel envs running
the FULL fused training step (rollout + GAE + PPO update + curriculum) on the
available accelerator.

``vs_baseline`` is measured, not assumed: the baseline is a faithful
reference-architecture loop (serial Python env stepping a materialized
500x500 NumPy field + per-step torch-CPU policy forward + PPO update every
256 steps — the shape of PPOV2.0/train_ppo2.0.py:110-265) timed on this host,
since the reference never published throughput numbers (SURVEY.md §6).
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def _enable_compile_cache(jax):
    """Persistent compilation cache: the fused train step takes minutes to
    compile through the tunneled backend; cache it across bench runs."""
    import os

    cache = os.environ.get(
        "TPU_PLUME_JAX_CACHE", os.path.expanduser("~/.cache/tpu_plume_jax")
    )
    os.makedirs(cache, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    except Exception:
        pass


# ---------------------------------------------------------------------------
# Reference-architecture baseline (serial numpy env + torch policy)
# ---------------------------------------------------------------------------


def measure_reference_baseline(num_steps: int = 1500) -> float:
    import torch

    G, PEAK, TI = 500, 100.0, 3.0
    SIGMA = G / 16
    rng = np.random.RandomState(0)

    class SerialEnv:
        """Same architecture as the reference env: O(grid^2) field per
        reset, per-step scalar numpy math."""

        def reset(self):
            self.src = rng.rand(2) * (G - 100) + 50
            x, y = np.mgrid[:G, :G]
            d = np.sqrt((x - self.src[0]) ** 2 + (y - self.src[1]) ** 2)
            base = PEAK * np.exp(-(d**2) / (2 * SIGMA**2))
            turb = TI * (
                np.abs(rng.randn(G, G))
                + 0.3 * np.sin(0.05 * x) * np.cos(0.07 * y)
                + 0.2 * rng.rand(G, G)
            )
            self.conc = np.clip(base + turb, 0, PEAK)
            self.tke = turb
            self.pos = np.zeros(2)
            self.t = 0
            self.visited = {}
            return self._obs()

        def _obs(self):
            i = int(min(max(self.pos[0], 0), G - 1))
            j = int(min(max(self.pos[1], 0), G - 1))
            cell = (i // 50, j // 50)
            v = self.visited.get(cell, 0)
            return np.array(
                [self.pos[0] / G, self.pos[1] / G, self.conc[i, j] / PEAK,
                 self.tke[i, j] / (3 * TI), self.t / 1000, min(v / 5, 1.0)],
                np.float32,
            )

        def step(self, a):
            self.t += 1
            m = G * 0.05
            dx, dy = [(0, 0), (0, m), (0, -m), (m, 0), (-m, 0)][a]
            i = int(min(max(self.pos[0], 0), G - 1))
            j = int(min(max(self.pos[1], 0), G - 1))
            turb = m * 0.2 * rng.randn(2) * self.tke[i, j] / (3 * TI)
            self.pos = np.clip(self.pos + [dx, dy] + turb, 0, G - 1)
            cell = (int(self.pos[0] // 50), int(self.pos[1] // 50))
            self.visited[cell] = self.visited.get(cell, 0) + 1
            obs = self._obs()
            reward = 2.0 * obs[2] - 0.4 * obs[3] - 0.15 * (1 - (m > 0))
            done = self.t >= 1000 or np.linalg.norm(self.pos - self.src) < 50
            return obs, reward, done

    torch.set_num_threads(max(1, torch.get_num_threads()))
    net = torch.nn.Sequential(
        torch.nn.Linear(6, 256), torch.nn.LayerNorm(256), torch.nn.ReLU(),
        torch.nn.Linear(256, 128), torch.nn.LayerNorm(128), torch.nn.ReLU(),
    )
    actor, critic = torch.nn.Linear(128, 5), torch.nn.Linear(128, 1)
    opt = torch.optim.Adam(
        list(net.parameters()) + list(actor.parameters()) + list(critic.parameters()),
        lr=3e-5,
    )

    env = SerialEnv()
    obs = env.reset()
    buf_s, buf_a, buf_r, buf_v, buf_lp, buf_d = [], [], [], [], [], []
    t0 = time.perf_counter()
    for _ in range(num_steps):
        with torch.no_grad():
            h = net(torch.from_numpy(obs).unsqueeze(0))
            probs = torch.softmax(actor(h), -1)
            v = critic(h)
        a = int(torch.multinomial(probs, 1))
        nobs, r, done = env.step(a)
        buf_s.append(obs); buf_a.append(a); buf_r.append(r)
        buf_v.append(float(v)); buf_lp.append(float(torch.log(probs[0, a]))); buf_d.append(done)
        obs = env.reset() if done else nobs
        if len(buf_s) >= 256:
            s = torch.tensor(np.stack(buf_s)); acts = torch.tensor(buf_a)
            rew = torch.tensor(buf_r, dtype=torch.float32)
            vals = torch.tensor(buf_v); olp = torch.tensor(buf_lp)
            dn = torch.tensor(buf_d, dtype=torch.float32)
            adv = torch.zeros_like(rew); last = 0.0; nv = 0.0
            for t in reversed(range(len(rew))):
                nv = vals[t + 1] * (1 - dn[t]) if t + 1 < len(rew) else 0.0
                delta = rew[t] + 0.99 * nv - vals[t]
                last = delta + 0.99 * 0.95 * (1 - dn[t]) * last
                adv[t] = last
            adv = (adv - adv.mean()) / (adv.std() + 1e-6)
            ret = adv + vals
            for _e in range(5):
                idx = torch.randperm(len(s))
                h = net(s[idx]); probs = torch.softmax(actor(h), -1)
                dist = torch.distributions.Categorical(probs)
                lp = dist.log_prob(acts[idx]); ratio = (lp - olp[idx]).exp()
                pl = -torch.min(ratio * adv[idx],
                                torch.clamp(ratio, 0.8, 1.2) * adv[idx]).mean()
                vl = 0.5 * ((critic(h).squeeze() - ret[idx]) ** 2).mean()
                loss = pl + vl - 0.01 * dist.entropy().mean()
                opt.zero_grad(); loss.backward(); opt.step()
            buf_s, buf_a, buf_r, buf_v, buf_lp, buf_d = [], [], [], [], [], []
    return num_steps / (time.perf_counter() - t0)


# ---------------------------------------------------------------------------
# TPU fused-train-step measurement
# ---------------------------------------------------------------------------


def measure_tpu(
    num_envs: int,
    unroll: int,
    iters: int,
    minibatches: int = 8,
    bank_kind: str = "none",
    bank_gather: str = "auto",
    bf16: bool = False,
    bf16_update: bool = False,
    remat: bool = False,
) -> dict:
    """Fused-train-step throughput for one field configuration.

    ``bank_kind``: "none" = analytic isotropic plume (the flagship config);
    "2d" = static gridded bank [64, 500, 500] with integer-cell lookups;
    "3d" = the full north-star path (BASELINE.json configs[4]) — 3-D flight
    through a time-varying [4, 8, 8, 500, 500] WRF-LES-style volume with
    sub-cell (x, y, z, t) multilinear queries and wind advection."""
    import jax

    _enable_compile_cache(jax)

    from tpu_plume.core.config import (
        CurriculumConfig,
        EnvConfig,
        PPOConfig,
        RolloutConfig,
        TrainConfig,
    )
    from tpu_plume.rl.curriculum import curriculum_init
    from tpu_plume.rollout import init_rollout
    from tpu_plume.train.ppo_trainer import LoopCarry, build_train_step, make_train_state

    batch = num_envs * unroll
    if bank_kind == "2d":
        env_cfg = EnvConfig(max_steps=1000, plume_sigma=15.0, plume_model="gridded")
    elif bank_kind == "3d":
        env_cfg = EnvConfig(
            max_steps=1000, plume_sigma=15.0, plume_model="gridded",
            env_3d=True, subcell_sampling=True, wind_advect_coef=0.5,
            bank_gather_mode=bank_gather,
        )
    else:
        env_cfg = EnvConfig(max_steps=1000, plume_sigma=500 / 16)
    cfg = TrainConfig(
        name="bench",
        env=env_cfg,
        # TPU-scale minibatching: same 5 epochs, minibatch sized for MXU
        # utilization instead of the reference's CPU-era 256.
        ppo=PPOConfig(minibatch_size=batch // minibatches, epochs=5,
                      bf16_compute=bf16, bf16_update=bf16_update,
                      remat=remat),
        curriculum=CurriculumConfig(),
        rollout=RolloutConfig(num_envs=num_envs, unroll_length=unroll),
    )
    key = jax.random.PRNGKey(0)
    k_model, k_roll, k_loop = jax.random.split(key, 3)
    bank = None
    if bank_kind == "2d":
        from tpu_plume.fields import gridded

        bank = gridded.synthesize_bank(jax.random.PRNGKey(7), cfg.env, num_fields=64)
    elif bank_kind == "3d":
        from tpu_plume.fields import gridded

        bank = gridded.synthesize_3d_bank(
            jax.random.PRNGKey(7), cfg.env, num_fields=4, num_frames=8,
            num_levels=8, steps_per_frame=128.0,
        )
        bank = gridded.maybe_pack(bank, cfg.env)
    loop = LoopCarry(
        train_state=make_train_state(cfg, k_model),
        rollout=init_rollout(k_roll, cfg.env, num_envs,
                             radius=50.0, explore_bonus=0.6, bank=bank),
        curriculum=curriculum_init(cfg.curriculum, 0.6),
        key=k_loop,
    )
    train_step = build_train_step(cfg, bank=bank)

    # Timing discipline (CLAUDE.md): block_until_ready can return before
    # execution finishes on tunneled PJRT backends, so every measurement is
    # anchored by a scalar host transfer that DEPENDS on the full iteration
    # chain (each train_step consumes the previous carry).  Two numbers:
    #   - pipelined (the trainer's steady state, sync_every=8): the host
    #     round trip (~30 ms through the tunnel) overlaps device compute;
    #   - per-iteration sync: pays one round trip per step.
    t0 = time.perf_counter()
    loop, stats, _ = train_step(loop)
    _ = float(stats["loss/total"])
    compile_s = time.perf_counter() - t0

    sync_every = 8
    t0 = time.perf_counter()
    for i in range(iters):
        loop, stats, _ = train_step(loop)
        if (i + 1) % sync_every == 0:
            _ = float(stats["loss/total"])
    _ = float(stats["loss/total"])
    dt = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(max(iters // 2, 5)):
        loop, stats, _ = train_step(loop)
        _ = float(stats["loss/total"])
    dt_sync = (time.perf_counter() - t0) / max(iters // 2, 5)

    steps = num_envs * unroll * iters
    updates = iters * 5 * minibatches
    # Record the persistent-cache state alongside compile_s: a 400 s
    # compile with a cold cache is normal; the same number warm would be a
    # tunnel regression (round-4 VERDICT weak #5 — the two were previously
    # indistinguishable in the driver's JSON).
    cache_dir = os.environ.get(
        "TPU_PLUME_JAX_CACHE", os.path.expanduser("~/.cache/tpu_plume_jax")
    )
    try:
        cache_entries = len(os.listdir(cache_dir))
    except OSError:
        cache_entries = 0
    return {
        "steps_per_sec": steps / dt,
        "steps_per_sec_synced": num_envs * unroll / dt_sync,
        "updates_per_sec": updates / dt,
        "compile_s": compile_s,
        "compile_cache": ("warm" if compile_s < 60.0 else "cold-or-slow"),
        "compile_cache_entries": cache_entries,
        "platform": jax.devices()[0].platform,
    }


def _backend_available(timeout: float = 180.0) -> bool:
    """Probe the default (tunneled TPU) backend in a bounded subprocess.

    A dead axon service hangs clients ~25 min in backend init before
    raising UNAVAILABLE (seen 2026-08-17); without this bound the driver's
    bench capture would record nothing at all."""
    import subprocess
    import sys

    code = "import jax; jax.numpy.zeros(1).block_until_ready(); print('ok')"
    try:
        p = subprocess.run(
            [sys.executable, "-c", code], timeout=timeout, capture_output=True
        )
        return p.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=4096)
    ap.add_argument("--unroll", type=int, default=128)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--baseline-steps", type=int, default=1500)
    ap.add_argument("--skip-baseline", action="store_true")
    ap.add_argument("--bank", choices=["all", "none", "2d", "3d"], default="all",
                    help="field path(s) to bench: the analytic flagship, a "
                         "static 2-D gridded bank, the 3-D time-varying "
                         "north-star bank, or all three (default)")
    args = ap.parse_args()

    cpu_fallback = False
    if not _backend_available():
        # Honest degradation: measure on CPU rather than hang/record
        # nothing, and say so in the artifact.  Skip the gridded banks
        # (a 4 GB packed volume has no business on the host) and trim
        # iterations — the number documents availability, not speed.
        import jax

        jax.config.update("jax_platforms", "cpu")
        cpu_fallback = True
        args.bank = "none"
        args.iters = min(args.iters, 4)

    if args.skip_baseline:
        base_sps = 2000.0  # conservative prior for the serial loop
    else:
        base_sps = measure_reference_baseline(args.baseline_steps)

    main_kind = "none" if args.bank == "all" else args.bank
    # Flagship runs mixed-precision (bf16 trunk compute, f32 params/loss;
    # PPOConfig.bf16_compute): measured +48% over f32 with training quality
    # parity (RESULTS.md round 3 bf16 study); the f32 number rides along in
    # extra.
    tpu = measure_tpu(args.envs, args.unroll, args.iters, bank_kind=main_kind,
                      bf16=True)
    tpu_f32 = measure_tpu(args.envs, args.unroll, max(8, args.iters // 2),
                          bank_kind=main_kind)

    suffix = {"none": "", "2d": "_bank2d", "3d": "_bank3d"}[main_kind]
    result = {
        "metric": f"env_steps_per_sec_fused_train_{args.envs}envs{suffix}",
        "value": round(tpu["steps_per_sec"], 1),
        "unit": "env_steps/s",
        "vs_baseline": round(tpu["steps_per_sec"] / base_sps, 1),
        "extra": {
            "baseline_serial_steps_per_sec": round(base_sps, 1),
            "steps_per_sec_synced_each_iter": round(tpu["steps_per_sec_synced"], 1),
            "ppo_updates_per_sec": round(tpu["updates_per_sec"], 2),
            "compile_s": round(tpu["compile_s"], 1),
            "compile_cache": tpu["compile_cache"],
            "compile_cache_entries": tpu["compile_cache_entries"],
            "platform": tpu["platform"],
            "f32_steps_per_sec": round(tpu_f32["steps_per_sec"], 1),
        },
    }
    if cpu_fallback:
        result["extra"]["tpu_unavailable_fell_back_to_cpu"] = True
        result["extra"]["last_tpu_run"] = {
            "analytic": 14.78e6, "bank2d": 9.46e6, "bank3d": 7.37e6,
            "note": "measured on the v5e mid-round (RESULTS.md round 3) "
                    "before the axon outage",
        }
    if args.bank == "all":
        # The north-star field paths (BASELINE.json configs[4]) next to the
        # analytic flagship, in the one driver-captured artifact.
        bank_iters = max(8, args.iters // 2)
        for kind in ("2d", "3d"):
            r = measure_tpu(args.envs, args.unroll, bank_iters, bank_kind=kind,
                            bf16=True)
            result["extra"][f"bank_{kind}_steps_per_sec"] = round(r["steps_per_sec"], 1)
            result["extra"][f"bank_{kind}_compile_s"] = round(r["compile_s"], 1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
