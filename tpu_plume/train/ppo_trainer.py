"""End-to-end PPO training orchestration.

The TPU-native counterpart of the reference train loops
(PPOV2.0/train_ppo2.0.py:110-265, PPOV1.1/train_ppo1.0.py:24-174,
PPOV1.0/ppo0.0.py:292-472): one jitted ``train_step`` fuses

    rollout (lax.scan of policy+env over N vmapped envs)
      -> GAE (reverse scan)
      -> PPO update (epochs x minibatches scans)
      -> batched curriculum transition

entirely on device; the host loop only drains completed-episode records for
CSV stats (reference's training_results CSV), NetCDF trajectory capture of
successful small-radius episodes (reference RadiusTracker gating,
train_ppo2.0.py:90-108, 215-227), progress printing, and checkpointing.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.training.train_state import TrainState

from tpu_plume.core.config import TrainConfig
from tpu_plume.models import ActorCritic
from tpu_plume.obsv.metrics import EpisodeCSVLogger, Stopwatch, TrainLogger
from tpu_plume.rl.curriculum import CurriculumState, curriculum_init, curriculum_update
from tpu_plume.rl.gae import compute_gae
from tpu_plume.rl.ppo import PPOBatch, normalize_advantages, ppo_update
from tpu_plume.rollout.rollout import RolloutCarry, init_rollout, rollout_chunk


@struct.dataclass
class LoopCarry:
    """Device-resident training loop state."""

    train_state: TrainState
    rollout: RolloutCarry
    curriculum: CurriculumState
    key: jax.Array


@dataclasses.dataclass
class TrainResult:
    params: Any
    curriculum: Any
    episodes: int
    successes: int
    env_steps: int
    steps_per_sec: float
    out_dir: str


def make_policy_model(cfg: TrainConfig, dtype=None):
    """The policy network for ``cfg.ppo.arch`` — shared by trainer, eval,
    and CLI checkpoint loading.  ``dtype`` overrides the compute dtype
    (params are f32 regardless): the bf16_update split builds a bfloat16
    twin of the same architecture for the update-side loss."""
    if dtype is None:
        dtype = jnp.bfloat16 if cfg.ppo.bf16_compute else jnp.float32
    if cfg.ppo.arch == "lstm":
        from tpu_plume.models.recurrent import RecurrentActorCritic

        return RecurrentActorCritic(
            num_actions=cfg.env.num_actions,
            embed_size=cfg.ppo.lstm_embed,
            lstm_hidden=cfg.ppo.lstm_hidden,
            dtype=dtype,
            layer_norm_cell=cfg.ppo.lstm_layer_norm,
        )
    # --f32-heads: under any bf16 compute path the heads stay f32 (the
    # terminal-precision split; no-op when dtype is already f32 since
    # head_dtype=None means "follow dtype")
    head_dtype = (jnp.float32 if (cfg.ppo.f32_heads
                                  and dtype == jnp.bfloat16) else None)
    return ActorCritic(
        num_actions=cfg.env.num_actions,
        hidden_sizes=cfg.ppo.hidden_sizes,
        dtype=dtype,
        head_dtype=head_dtype,
    )


def make_train_state(cfg: TrainConfig, key: jax.Array) -> TrainState:
    model = make_policy_model(cfg)
    if cfg.ppo.arch == "lstm":
        params = model.init(
            key, model.initial_state(1), jnp.zeros((1, cfg.env.obs_dim))
        )
    else:
        params = model.init(key, jnp.zeros((1, cfg.env.obs_dim)))
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.ppo.max_grad_norm),
        optax.adam(cfg.ppo.learning_rate),
    )
    return TrainState.create(apply_fn=model.apply, params=params, tx=tx)


class _BankStep:
    """A jitted train step with the field bank bound as a RUNTIME argument.

    Closing over the bank would bake it into the compiled program as a
    constant — the tunneled backend serializes constants into the compile
    request, and a packed 3-D bank (>1 GB) blows the transport's body
    limit (HTTP 413).  Passing it per call ships only the buffer handle."""

    def __init__(self, jitted, bank):
        self._jitted = jitted
        self._bank = bank

    def __call__(self, loop):
        return self._jitted(loop, self._bank)

    def lower(self, loop):
        return self._jitted.lower(loop, self._bank)


def build_train_step(
    cfg: TrainConfig, donate: bool = False, bank=None, with_grads: bool = False,
    guide=None,
) -> Callable:
    """One fused training iteration; jit once per config.

    ``donate`` donates the loop carry (saves a buffer copy per iteration) but
    is unsupported by some PJRT transports (e.g. tunneled single-chip
    backends return INVALID_ARGUMENT) — off by default.

    ``with_grads`` adds a ``"grads"`` pytree to the stats dict for
    TensorBoard gradient histograms (reference logs per-gradient histograms
    each episode, PPOV1.1/train_ppo1.0.py:156-162).  Deviation: the
    reference logs the last minibatch's still-attached ``.grad`` tensors;
    here it is the FULL-batch gradient at the post-update params — one extra
    fwd+bwd per iteration, paid only in logging mode, and a strictly
    lower-variance histogram."""
    env_cfg, ppo_cfg, cur_cfg = cfg.env, cfg.ppo, cfg.curriculum
    T = cfg.rollout.unroll_length
    rnn = make_policy_model(cfg) if ppo_cfg.arch == "lstm" else None
    # bf16_update split: the update-side loss runs a bfloat16-compute twin
    # of the model over the SAME f32 params; the rollout stays f32 (see
    # PPOConfig.bf16_update)
    update_apply = None
    if ppo_cfg.bf16_update and not ppo_cfg.bf16_compute:
        update_apply = make_policy_model(cfg, dtype=jnp.bfloat16).apply
    if ppo_cfg.distill_oracle:
        from tpu_plume.evaluation.oracle import make_oracle

        oracle = make_oracle(ppo_cfg.distill_oracle, env_cfg)
    else:
        oracle = None

    def train_step(loop: LoopCarry, bank):
        key, k_update = jax.random.split(loop.key)

        # Push current curriculum values into every env (reference
        # PPOTrainer.update assigns them onto the env, model.py:131-133).
        n = loop.rollout.obs.shape[0]
        env_state = loop.rollout.env_state.replace(
            radius=jnp.broadcast_to(loop.curriculum.radius, (n,)),
            explore_bonus=jnp.broadcast_to(loop.curriculum.explore_bonus, (n,)),
        )
        carry = loop.rollout.replace(env_state=env_state)
        h_init = carry.hidden  # BPTT replay root (chunk-start carry)

        carry, traj, bootstrap = rollout_chunk(
            loop.train_state.params, loop.train_state.apply_fn, carry, env_cfg, T,
            bank=bank, rnn=rnn, oracle=oracle, guide=guide,
        )

        advantages, returns = compute_gae(
            traj.reward, traj.value, traj.done, bootstrap,
            ppo_cfg.gamma, ppo_cfg.gae_lambda,
        )
        flat = lambda x: x.reshape((-1,) + x.shape[2:])
        if rnn is not None:
            # Sequence-major update: hidden replay needs the time axis.
            from tpu_plume.rl.ppo import RecurrentPPOBatch, ppo_update_recurrent

            adv_n = normalize_advantages(advantages, ppo_cfg)
            ret = adv_n + traj.value if ppo_cfg.bug_compat_returns else returns
            resets = jnp.concatenate(
                [jnp.zeros((1, n), bool), traj.done[:-1]], axis=0
            )
            rbatch = RecurrentPPOBatch(
                obs=traj.obs,
                actions=traj.action,
                old_log_probs=traj.log_prob,
                advantages=adv_n,
                returns=ret,
                old_values=traj.value,
                resets=resets,
                h_init=h_init,
                oracle_actions=traj.oracle_action,
            )
            ts_in = (loop.train_state.replace(apply_fn=update_apply)
                     if update_apply is not None else loop.train_state)
            train_state, loss_metrics = ppo_update_recurrent(
                ts_in, rbatch, k_update, ppo_cfg
            )
            if update_apply is not None:
                train_state = train_state.replace(
                    apply_fn=loop.train_state.apply_fn)
            if with_grads:
                from tpu_plume.rl.ppo import ppo_loss_recurrent

                grads_tree, _ = jax.grad(ppo_loss_recurrent, has_aux=True)(
                    train_state.params, train_state.apply_fn, rbatch, ppo_cfg
                )
        else:
            adv_n = normalize_advantages(flat(advantages), ppo_cfg)
            if ppo_cfg.bug_compat_returns:
                # Reference quirk: returns built from *normalized* advantages
                # (PPOV2.0/train_ppo2.0.py:40).
                ret = adv_n + flat(traj.value)
            else:
                ret = flat(returns)
            batch = PPOBatch(
                obs=flat(traj.obs),
                actions=flat(traj.action),
                old_log_probs=flat(traj.log_prob),
                advantages=adv_n,
                returns=ret,
                old_values=flat(traj.value),
                oracle_actions=(
                    flat(traj.oracle_action) if oracle is not None else None
                ),
                weights=(
                    1.0 - flat(traj.override).astype(jnp.float32)
                    if guide is not None else None
                ),
            )
            ts_in = (loop.train_state.replace(apply_fn=update_apply)
                     if update_apply is not None else loop.train_state)
            train_state, loss_metrics = ppo_update(ts_in, batch, k_update, ppo_cfg)
            if update_apply is not None:
                train_state = train_state.replace(
                    apply_fn=loop.train_state.apply_fn)
            if with_grads:
                from tpu_plume.rl.ppo import ppo_loss

                grads_tree, _ = jax.grad(ppo_loss, has_aux=True)(
                    train_state.params, train_state.apply_fn, batch, ppo_cfg
                )

        new_episodes = traj.done.sum().astype(jnp.int32)
        new_successes = (traj.done & traj.episode.success).sum().astype(jnp.int32)
        curriculum = curriculum_update(
            loop.curriculum, new_successes, new_episodes, cur_cfg
        )

        stats = dict(loss_metrics)
        stats.update(
            {
                "rollout/mean_reward": traj.reward.mean(),
                "rollout/episodes": new_episodes,
                "rollout/successes": new_successes,
                "curriculum/radius": curriculum.radius,
                "curriculum/explore_bonus": curriculum.explore_bonus,
                "curriculum/updates": curriculum.num_updates,
            }
        )
        if with_grads:
            stats["grads"] = grads_tree
        new_loop = LoopCarry(
            train_state=train_state, rollout=carry, curriculum=curriculum, key=key
        )
        return new_loop, stats, traj

    if donate:
        return _BankStep(jax.jit(train_step, donate_argnums=(0,)), bank)
    return _BankStep(jax.jit(train_step), bank)


class RadiusTracker:
    """Host-side gate: capture only successful episodes at the two smallest
    curriculum radii seen so far (reference train_ppo2.0.py:90-108)."""

    def __init__(self):
        self.radius_history: list[float] = []

    def update(self, radius: float, is_success: bool) -> bool:
        if is_success:
            if radius not in self.radius_history:
                self.radius_history.append(radius)
                self.radius_history.sort()
                if len(self.radius_history) > 2:
                    del self.radius_history[-1]
        return is_success and radius in self.radius_history


class EpisodeAssembler:
    """Reassembles per-episode (x, y, conc) trajectories from fixed-shape
    rollout chunks — the host-side drain of the mask-based device buffers
    (SURVEY.md §7 "hard parts": variable-length episode data)."""

    def __init__(self, num_envs: int, max_steps: int):
        self.x = np.full((num_envs, max_steps), np.nan, np.float32)
        self.y = np.full((num_envs, max_steps), np.nan, np.float32)
        self.c = np.full((num_envs, max_steps), np.nan, np.float32)
        self.n = num_envs
        from tpu_plume.native import get_drain

        self._native = get_drain()

    def drain(self, traj_np: dict):
        """Yields dicts of completed episodes in scan order."""
        pos = np.ascontiguousarray(traj_np["pos"], np.float32)   # [T, N, 2]
        conc = np.ascontiguousarray(traj_np["conc"], np.float32)  # [T, N]
        done = traj_np["done"]        # [T, N]
        steps = np.ascontiguousarray(traj_np["steps"], np.int32)  # 1-based
        rec = traj_np["episode"]

        if self._native is not None:
            # One C++ pass; completed episodes are copied out at their
            # completion step (their buffer rows are reused by successor
            # episodes later in the chunk).
            for env, s, t, bx, by, bc in self._native(
                self.x, self.y, self.c, pos, conc,
                np.ascontiguousarray(done, np.uint8), steps,
            ):
                yield {
                    "env": int(env),
                    "steps": int(s),
                    "x": np.frombuffer(bx, np.float32),
                    "y": np.frombuffer(by, np.float32),
                    "conc": np.frombuffer(bc, np.float32),
                    **{k: np.asarray(v[t, env]) for k, v in rec.items()},
                }
            return

        envs = np.arange(self.n)
        for t in range(pos.shape[0]):
            idx = np.minimum(steps[t] - 1, self.x.shape[1] - 1)
            self.x[envs, idx] = pos[t, :, 0]
            self.y[envs, idx] = pos[t, :, 1]
            self.c[envs, idx] = conc[t]
            for env in np.nonzero(done[t])[0]:
                s = int(steps[t, env])
                s_clip = min(s, self.x.shape[1])
                yield {
                    "env": int(env),
                    "steps": s,
                    "x": self.x[env, :s_clip].copy(),
                    "y": self.y[env, :s_clip].copy(),
                    "conc": self.c[env, :s_clip].copy(),
                    **{k: np.asarray(v[t, env]) for k, v in rec.items()},
                }


def train_ppo(
    cfg: TrainConfig,
    out_dir: str,
    *,
    capture_netcdf: bool = False,
    write_csv: bool = True,
    use_tensorboard: bool = False,
    max_iterations: int | None = None,
    log_every: int = 10,
    verbose: bool = True,
    capture_conc_csv: bool = False,
    profile_steps: int = 0,
    snapshot_every: int | None = None,
    init_params=None,
    bank=None,
    sync_every: int | None = None,
    resume_from: str | None = None,
    guide=None,
) -> TrainResult:
    """Train until ``cfg.total_episodes`` episodes complete (or
    ``max_iterations`` train steps).  ``init_params`` warm-starts the policy
    (fine-tuning; optimizer state starts fresh).  ``bank`` is the
    HBM-resident FieldBank for ``plume_model="gridded"`` configs.

    ``sync_every`` pipelines host<->device synchronization: the device runs
    up to K iterations ahead while the host consumes stats/records with a
    K-iteration lag.  On the tunneled single-chip backend one round trip
    costs ~30 ms against a ~32 ms device step, so per-iteration syncing
    halves throughput (measured 8.2M -> 15.3M env-steps/s at K=8).  Default
    8 — record drains ride the same packed per-window transfer.

    ``resume_from`` restarts an interrupted run from a full-bundle
    checkpoint (the end-of-run ``checkpoint`` dir or a periodic
    ``checkpoint_iterNNNNNN`` written by ``snapshot_every``): params,
    optimizer state, the entire device rollout carry (env states, obs,
    per-episode accumulators, PRNG), curriculum, and host counters are all
    restored, so the continuation is bit-identical to the uninterrupted run
    (pinned by tests/test_train.py::test_kill_and_resume_equivalence).  The
    reference cannot do this at all — it saves final state_dicts only
    (PPOV2.0/train_ppo2.0.py:254-256).  CSV logs append; ``total_episodes``
    and ``max_iterations`` stay absolute targets.  Host-side NetCDF capture
    buffers are NOT part of the bundle: a resumed capture run restarts its
    training_data.nc (episode records and CSV stats remain exact)."""
    os.makedirs(out_dir, exist_ok=True)
    key = jax.random.PRNGKey(cfg.seed)
    k_model, k_roll, k_loop = jax.random.split(key, 3)

    train_state = make_train_state(cfg, k_model)
    if init_params is not None:
        train_state = train_state.replace(params=jax.tree.map(jnp.asarray, init_params))
    curriculum = curriculum_init(cfg.curriculum, cfg.env.explore_bonus_init)
    hidden = (
        make_policy_model(cfg).initial_state(cfg.rollout.num_envs)
        if cfg.ppo.arch == "lstm"
        else None
    )
    if guide is not None and cfg.ppo.arch == "lstm":
        raise ValueError(
            "guided fine-tuning (--guide) supports the feedforward arch only")
    rollout = init_rollout(
        k_roll, cfg.env, cfg.rollout.num_envs,
        radius=cfg.curriculum.initial_radius,
        explore_bonus=cfg.env.explore_bonus_init,
        bank=bank,
        hidden=hidden,
        guide=guide,
    )
    loop = LoopCarry(train_state=train_state, rollout=rollout, curriculum=curriculum, key=k_loop)

    episodes = successes = env_steps = 0
    iteration = 0
    if resume_from is not None:
        if init_params is not None:
            raise ValueError("resume_from and init_params are exclusive: a "
                             "resume restores the params it was saved with")
        from tpu_plume.data.checkpoint import restore_checkpoint

        # Typed restore: the freshly initialized loop supplies the abstract
        # template, so cfg (num_envs, arch, plume model) must match the
        # saving run — a mismatch fails loudly here, not mid-train.
        template = {
            "params": train_state.params,
            "opt_state": train_state.opt_state,
            "rollout": rollout,
            "curriculum": curriculum,
            "key": k_loop,
            "counters": {"episodes": 0, "successes": 0,
                         "env_steps": 0, "iteration": 0},
        }
        bundle = restore_checkpoint(resume_from, target=template)
        loop = LoopCarry(
            train_state=train_state.replace(
                params=bundle["params"], opt_state=bundle["opt_state"]
            ),
            rollout=bundle["rollout"],
            curriculum=bundle["curriculum"],
            key=bundle["key"],
        )
        episodes = int(bundle["counters"]["episodes"])
        successes = int(bundle["counters"]["successes"])
        env_steps = int(bundle["counters"]["env_steps"])
        iteration = int(bundle["counters"]["iteration"])

    # Gradient histograms ride the packed stats transfer (f32 pack is
    # lossless for f32 grads) — only when TensorBoard is consuming them.
    train_step = build_train_step(
        cfg, bank=bank, with_grads=use_tensorboard, guide=guide
    )

    def _full_bundle():
        """Everything a bit-exact continuation needs (SURVEY.md §5)."""
        return {
            "params": jax.device_get(loop.train_state.params),
            "opt_state": jax.device_get(loop.train_state.opt_state),
            "rollout": jax.device_get(loop.rollout),
            "curriculum": jax.device_get(loop.curriculum),
            "key": jax.device_get(loop.key),
            "counters": {"episodes": episodes, "successes": successes,
                         "env_steps": env_steps, "iteration": iteration},
        }

    resuming = resume_from is not None
    csv_logger = (
        EpisodeCSVLogger(os.path.join(out_dir, "training_results.csv"),
                         append=resuming)
        if write_csv else None
    )
    train_logger = TrainLogger(out_dir, use_tensorboard, append=resuming)
    nc_writer = None
    tracker = RadiusTracker()
    assembler = None
    if capture_netcdf:
        from tpu_plume.data.netcdf import NetCDFWriter

        nc_writer = NetCDFWriter(
            os.path.join(out_dir, "training_data.nc"),
            grid_size=cfg.env.grid_size,
            max_episodes=cfg.total_episodes,
            max_steps=cfg.env.max_steps,
            with_gaussian_params=cfg.name == "ppo_v2_1",
        )
        assembler = EpisodeAssembler(cfg.rollout.num_envs, cfg.env.max_steps)

    conc_csv_path = os.path.join(out_dir, "data.csv") if capture_conc_csv else None
    if conc_csv_path:
        if not (resuming and os.path.exists(conc_csv_path)):
            open(conc_csv_path, "w").close()
        if assembler is None:
            assembler = EpisodeAssembler(cfg.rollout.num_envs, cfg.env.max_steps)

    watch = Stopwatch()
    nc_written = 0
    per_iter_steps = cfg.rollout.num_envs * cfg.rollout.unroll_length
    t_start = time.perf_counter()
    t_steady = None  # set after the first (compile-bearing) iteration
    it_at_steady = 0

    need_records = (
        csv_logger is not None or nc_writer is not None or conc_csv_path
    )
    if sync_every is None:
        sync_every = 8
    # Pipeline: device stats/records ride in `pending` while the chip runs
    # ahead; the host consumes them sync_every iterations late.  Each
    # train_step consumes the previous carry, so popping entry i blocks
    # until iteration i has truly executed (the backend's
    # block_until_ready is unreliable — CLAUDE.md).
    from collections import deque

    pending: deque = deque()

    # Per-episode record fields the CSV logger consumes ([T, N] masked
    # arrays); the NC/conc-CSV drain additionally needs the trajectory.
    REC_KEYS = (
        "done", "success", "total_reward", "steps", "conc_reward",
        "explore_reward", "move_penalty", "tke_penalty",
        "boundary_penalty", "final_conc", "radius",
    )
    with_traj = nc_writer is not None or bool(conc_csv_path)

    def _record_device_tree(traj):
        """The subset of the on-device trajectory the host drain needs —
        kept as device refs in `pending`; transferred packed, per window."""
        ep = traj.episode
        d = {k: getattr(ep, k) for k in REC_KEYS}
        if with_traj:
            d["pos"] = traj.pos
            d["conc"] = traj.conc
            d["final_x"] = ep.final_x
            d["final_y"] = ep.final_y
        return d

    def _drain(it, rec):
        nonlocal nc_written
        if rec is None:
            return
        if csv_logger is not None:
            csv_logger.log_records({k: rec[k] for k in REC_KEYS})
        if with_traj:
            traj_np = {
                "pos": rec["pos"],
                "conc": rec["conc"],
                "done": rec["done"],
                "steps": rec["steps"],
                "episode": {
                    "success": rec["success"],
                    "final_conc": rec["final_conc"],
                    "final_x": rec["final_x"],
                    "final_y": rec["final_y"],
                    "radius": rec["radius"],
                },
            }
            for done_ep in assembler.drain(traj_np):
                if conc_csv_path and bool(done_ep["success"]):
                    # V1.2 ragged capture: conc sequence + source conc
                    # (PPOV1.2/ppo注释版.py:115-124).
                    from tpu_plume.data.conc_csv import save_conc_rows

                    save_conc_rows(
                        conc_csv_path,
                        [done_ep["conc"]],
                        [float(done_ep["final_conc"])],
                        append=True,
                    )
                if nc_writer is None or nc_written >= cfg.total_episodes:
                    continue
                if tracker.update(float(done_ep["radius"]), bool(done_ep["success"])):
                    nc_writer.write_episode_data(
                        episode_idx=nc_written,
                        steps=done_ep["steps"],
                        x=done_ep["x"],
                        y=done_ep["y"],
                        conc=done_ep["conc"],
                        source_x=float(done_ep["final_x"]),
                        source_y=float(done_ep["final_y"]),
                        source_conc=float(done_ep["final_conc"]),
                        sigma=cfg.env.plume_sigma,
                        peak=cfg.env.conc_peak,
                    )
                    nc_written += 1

    def _log(it, stats):
        if it % log_every == 0 or episodes >= cfg.total_episodes:
            # steady-state throughput: exclude the compile-bearing first iter
            dt = time.perf_counter() - t_steady
            sps = (it - it_at_steady) * per_iter_steps / max(dt, 1e-9)
            scalars = {k: float(v) for k, v in stats.items() if k != "grads"}
            scalars.update(
                {
                    "throughput/env_steps_per_sec": sps,
                    "progress/episodes": episodes,
                    "progress/successes": successes,
                }
            )
            train_logger.log(it, scalars)
            if use_tensorboard:
                train_logger.log_histograms(it, loop.train_state.params)
                if "grads" in stats:
                    train_logger.log_histograms(it, stats["grads"],
                                                prefix="grads")
            if verbose:
                print(
                    f"iter {it:5d} | eps {episodes:6d} | "
                    f"succ {successes / max(episodes, 1):5.1%} | "
                    f"radius {float(stats['curriculum/radius']):5.1f} | "
                    f"reward/step {float(stats['rollout/mean_reward']):7.3f} | "
                    f"{sps / 1e6:6.2f}M steps/s",
                    flush=True,
                )

    # One packed jitted transfer per window — see train/hostsync.py for
    # why (both transfers AND eager dispatches cost ~30 ms round trips).
    from tpu_plume.train.hostsync import drain_window, drain_window_rows

    # CSV-only records are compacted ON DEVICE to at most this many episode
    # rows per window (masked gather fused into the packed-stats call) —
    # moving the full [T, N] masks costs ~1.4 MB/iter through the tunnel,
    # a measured 4x trainer slowdown.  Tier 1 covers mean episode length
    # >= unroll/2; overflow re-packs the SAME window at the 8x tier-2 cap
    # (episodes shorter than unroll/16 on average are not physically
    # reachable — the goal is never closer than ~2 moves).  The full-mask
    # drain_window fallback is a last resort only: issuing its brand-new
    # 88-leaf pack program mid-run wedged the tunnel for good in a record
    # run the first time an efficient policy overflowed tier 1.
    _w = max(sync_every, 1)
    record_caps = (
        2 * cfg.rollout.num_envs * _w,
        16 * cfg.rollout.num_envs * _w,
    )

    # Periodic snapshots — the TPU-era equivalent of V1.1's "save every
    # successful episode's state_dict" list (PPOV1.1/train_ppo1.0.py:
    # 151-152, 173): at batched scale per-episode snapshots are meaningless,
    # so a FULL resume bundle is written at drain-window boundaries every
    # >= snapshot_every iterations instead — the window boundary is the one
    # place where the device loop carry, the host counters, and the drained
    # CSV rows are all consistent with the same iteration.
    last_snapshot_it = iteration

    def consume():
        nonlocal episodes, successes, t_steady, it_at_steady, last_snapshot_it
        window = list(pending)
        pending.clear()
        compact = csv_logger is not None and not with_traj
        if compact:
            pairs = [(st, rec) for _, st, rec in window]
            host_stats, rows, row_count = drain_window_rows(
                pairs, REC_KEYS, record_caps[0]
            )
            record_cap = record_caps[0]
            if row_count > record_cap:
                host_stats, rows, row_count = drain_window_rows(
                    pairs, REC_KEYS, record_caps[1]
                )
                record_cap = record_caps[1]
            host = [(s, None) for s in host_stats]
        else:
            host = drain_window([(st, rec) for _, st, rec in window])
        for (it, _, _), (stats, rec) in zip(window, host):
            # NaN tripwire — the reference raises on NaN logits/probs
            # (PPOV1.1/model.py:47-49, PPOV2.0/train_ppo2.0.py:57-62); the
            # whole-iteration loss is the canary (<= sync_every late).
            if not np.isfinite(stats["loss/total"]):
                raise RuntimeError(
                    f"non-finite loss at iteration {it}: {stats} — "
                    "re-run with --debug-nans to locate the producing op"
                )
            if t_steady is None:
                t_steady = time.perf_counter()
                it_at_steady = it
            _drain(it, rec)
            episodes += int(stats["rollout/episodes"])
            successes += int(stats["rollout/successes"])
            _log(it, stats)
        if compact:
            if row_count <= record_cap:
                valid = np.arange(record_cap) < row_count
                csv_logger.log_records({"done": valid, **rows})
            else:
                # Pathological tier-2 overflow (mean episode < unroll/16
                # steps): last-resort lossless full-mask drain.
                full = drain_window([rec for _, _, rec in window])
                for r in full:
                    csv_logger.log_records({k: r[k] for k in REC_KEYS})
        if snapshot_every and window:
            it_last = window[-1][0]  # == `iteration`: the device loop state
            if it_last - last_snapshot_it >= snapshot_every:
                from tpu_plume.data.checkpoint import save_checkpoint as _save

                _save(
                    os.path.join(out_dir, f"checkpoint_iter{it_last:06d}"),
                    _full_bundle(),
                )
                last_snapshot_it = it_last

    while episodes < cfg.total_episodes:
        if max_iterations is not None and iteration >= max_iterations:
            break
        if profile_steps and iteration == 2:
            jax.profiler.start_trace(os.path.join(out_dir, "profile"))
        watch.start("step")
        loop, stats, traj = train_step(loop)
        pending.append(
            (iteration + 1, stats,
             _record_device_tree(traj) if need_records else None)
        )
        iteration += 1
        env_steps += per_iter_steps
        if len(pending) >= max(sync_every, 1):
            consume()
        watch.stop("step")
        if profile_steps and iteration == 2 + profile_steps:
            jax.profiler.stop_trace()
    while pending:
        consume()

    total_dt = time.perf_counter() - (t_steady or t_start)
    if csv_logger is not None:
        csv_logger.close()
    if nc_writer is not None:
        nc_writer.close()
    train_logger.close()

    # Checkpoints: full-resume Orbax bundle + reference-name torch export.
    from tpu_plume.data.checkpoint import save_checkpoint
    from tpu_plume.data.torch_export import export_actor_critic_pth

    bundle = _full_bundle()
    params = bundle["params"]
    save_checkpoint(os.path.join(out_dir, "checkpoint"), bundle)
    model_dir = os.path.join(out_dir, "model")
    os.makedirs(model_dir, exist_ok=True)
    if cfg.ppo.arch == "mlp" and len(cfg.ppo.hidden_sizes) == 2:
        # .pth layout is pinned to the reference's 2-layer PPOActorCritic
        # (torch_export._AC_MAP); other archs persist via Orbax only.
        export_actor_critic_pth(
            params, os.path.join(model_dir, "ppo_successful_models.pth")
        )

    return TrainResult(
        params=params,
        curriculum=jax.device_get(loop.curriculum),
        episodes=episodes,
        successes=successes,
        env_steps=env_steps,
        steps_per_sec=(iteration - it_at_steady) * per_iter_steps
        / max(total_dt, 1e-9),
        out_dir=out_dir,
    )
