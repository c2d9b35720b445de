"""Command-line entry points.

The reference has no CLI at all — every script is ``python <file>.py`` with
configuration by editing config.py (SURVEY.md §1 L3).  This module provides
the flags it lacked:

    python -m tpu_plume.cli train        --preset ppo_v2_0 --out runs/v20
    python -m tpu_plume.cli train-gail   --preset ppo_v1_1 --expert expert_data.npz
    python -m tpu_plume.cli train-lstm   --variant threshold --nc training_data.nc
    python -m tpu_plume.cli eval         --preset ppo_v2_0 --ckpt runs/v20/checkpoint
    python -m tpu_plume.cli expert       --ckpt runs/v20/checkpoint --out expert_data.npz
    python -m tpu_plume.cli inspect-nc   training_data.nc
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os


def _load_params(args, cfg):
    """Load policy params from an Orbax checkpoint dir or a reference .pth.
    Honors ``--arch``/``--hidden`` so eval/expert build the same network the
    checkpoint was trained with."""
    import jax
    import jax.numpy as jnp

    from tpu_plume.train.ppo_trainer import make_policy_model

    ppo = cfg.ppo
    if getattr(args, "hidden", None):
        ppo = dataclasses.replace(
            ppo, hidden_sizes=tuple(int(h) for h in args.hidden.split(","))
        )
    if getattr(args, "arch", None):
        ppo = dataclasses.replace(ppo, arch=args.arch)
    if getattr(args, "ln_lstm", False):
        ppo = dataclasses.replace(ppo, lstm_layer_norm=True)
    model = make_policy_model(cfg.replace(ppo=ppo))
    if args.pth:
        from tpu_plume.data.torch_export import import_actor_critic_pth

        return model, import_actor_critic_pth(args.pth)
    if args.ckpt:
        from tpu_plume.data.checkpoint import restore_checkpoint

        bundle = restore_checkpoint(args.ckpt)
        params = bundle["params"] if "params" in bundle else bundle
        return model, jax.tree.map(jnp.asarray, params)
    raise SystemExit("need --ckpt or --pth")


def _apply_overrides(cfg, args):
    if getattr(args, "plume_model", None):
        cfg = cfg.replace(
            env=dataclasses.replace(cfg.env, plume_model=args.plume_model)
        )
    if getattr(args, "depth_coef", None) is not None:
        cfg = cfg.replace(
            env=dataclasses.replace(cfg.env, terminal_depth_coef=args.depth_coef)
        )
    if getattr(args, "depth_power", None) is not None:
        cfg = cfg.replace(
            env=dataclasses.replace(cfg.env, terminal_depth_power=args.depth_power)
        )
    if getattr(args, "terminal_gate", None) is not None:
        cfg = cfg.replace(
            env=dataclasses.replace(
                cfg.env, terminal_gate_radius=args.terminal_gate
            )
        )
    if getattr(args, "obs_memory", False):
        cfg = cfg.replace(env=dataclasses.replace(cfg.env, obs_memory=True))
    if getattr(args, "reward", None):
        cfg = cfg.replace(
            env=dataclasses.replace(cfg.env, reward_variant=args.reward)
        )
    if getattr(args, "inplume_bonus", None):
        cfg = cfg.replace(
            env=dataclasses.replace(cfg.env, inplume_bonus=args.inplume_bonus)
        )
    if getattr(args, "min_radius", None) is not None:
        cfg = cfg.replace(
            curriculum=dataclasses.replace(cfg.curriculum, min_radius=args.min_radius)
        )
    rollout = cfg.rollout
    if args.envs:
        rollout = dataclasses.replace(rollout, num_envs=args.envs)
    if args.unroll:
        rollout = dataclasses.replace(rollout, unroll_length=args.unroll)
    ppo = cfg.ppo
    if args.minibatch:
        ppo = dataclasses.replace(ppo, minibatch_size=args.minibatch)
    if getattr(args, "lr", None):
        ppo = dataclasses.replace(ppo, learning_rate=args.lr)
    if getattr(args, "entropy", None) is not None:
        ppo = dataclasses.replace(ppo, entropy_beta=args.entropy)
    if getattr(args, "bf16", False):
        ppo = dataclasses.replace(ppo, bf16_compute=True)
    if getattr(args, "bf16_update", False):
        ppo = dataclasses.replace(ppo, bf16_update=True)
    if getattr(args, "f32_heads", False):
        ppo = dataclasses.replace(ppo, f32_heads=True)
    if getattr(args, "hidden", None):
        ppo = dataclasses.replace(
            ppo, hidden_sizes=tuple(int(h) for h in args.hidden.split(","))
        )
    if getattr(args, "arch", None):
        ppo = dataclasses.replace(ppo, arch=args.arch)
    if getattr(args, "shuffle_mode", None):
        ppo = dataclasses.replace(ppo, shuffle_mode=args.shuffle_mode)
    if getattr(args, "ln_lstm", False):
        ppo = dataclasses.replace(ppo, lstm_layer_norm=True)
    if getattr(args, "distill", None):
        ppo = dataclasses.replace(ppo, distill_oracle=args.distill)
    if getattr(args, "distill_coef", None) is not None:
        ppo = dataclasses.replace(ppo, distill_coef=args.distill_coef)
    if getattr(args, "distill_gate", None) is not None:
        ppo = dataclasses.replace(ppo, distill_conc_gate=args.distill_gate)
    cfg = cfg.replace(rollout=rollout, ppo=ppo)
    if args.episodes:
        cfg = cfg.replace(total_episodes=args.episodes)
    if args.seed is not None:
        cfg = cfg.replace(seed=args.seed)
    return cfg


def _make_bank(args, cfg):
    """Build the FieldBank for gridded configs: ``--bank file.nc`` ingests a
    (possibly 3-D time-varying) WRF-LES NetCDF volume; ``--synth-bank``
    generates one procedurally.  Sub-cell configs get the packed
    (t, z)-neighbor layout (fields.gridded.maybe_pack — the 4-gather hot
    path).  Returns None for analytic plume models."""
    from tpu_plume.fields import gridded

    has_bank = bool(getattr(args, "bank", None))
    kind = getattr(args, "synth_bank", None)
    if (has_bank or kind is not None) and cfg.env.plume_model != "gridded":
        # a bank flag on a non-gridded env would be silently IGNORED —
        # the run trains/evals on the preset's procedural physics while
        # the user believes they are on the bank (costs a full training
        # run before the eval's --guide bank error surfaces it)
        raise SystemExit(
            f"--synth-bank/--bank given but plume_model="
            f"'{cfg.env.plume_model}' would ignore it; add "
            f"--plume-model gridded (or a gridded preset)"
        )
    if has_bank:
        return gridded.maybe_pack(gridded.ingest_netcdf(args.bank), cfg.env)
    if kind is None:
        if cfg.env.plume_model == "gridded":
            raise SystemExit(
                'plume_model="gridded" needs --bank <file.nc> or --synth-bank'
            )
        return None
    import jax

    key = jax.random.PRNGKey(getattr(args, "bank_seed", 0) or 0)
    k = args.bank_fields or (4 if kind == "3d" else 64)
    if kind == "static":
        bank = gridded.synthesize_bank(key, cfg.env, num_fields=k)
    elif kind == "les":
        bank = gridded.synthesize_les_bank(
            key, cfg.env, num_fields=args.bank_fields or 16,
            num_frames=args.bank_frames or 16,
            steps_per_frame=args.bank_spf or 64.0,
        )
    elif kind == "time":
        bank = gridded.synthesize_time_varying_bank(
            key, cfg.env, num_fields=k,
            num_frames=args.bank_frames or 16,
            steps_per_frame=args.bank_spf or 64.0,
        )
    else:
        bank = gridded.synthesize_3d_bank(
            key, cfg.env, num_fields=k,
            num_frames=args.bank_frames or 8,
            num_levels=args.bank_levels or 8,
            steps_per_frame=args.bank_spf or 128.0,
        )
    return gridded.maybe_pack(bank, cfg.env)


def cmd_train(args):
    from tpu_plume.core import get_preset
    from tpu_plume.train import train_ppo

    cfg = _apply_overrides(get_preset(args.preset), args)
    init_params = None
    if args.resume and (args.ckpt or args.pth):
        raise SystemExit("--resume restores its own params; drop --ckpt/--pth")
    if args.ckpt or args.pth:
        _, init_params = _load_params(args, cfg)
    guide = None
    if getattr(args, "train_guide", None) == "fit":
        from tpu_plume.evaluation.guidance import make_guide

        # policy-in-the-loop fine-tuning (round 5): the eval-time guide
        # rides the TRAINING rollout at the protocol's radius-50
        # terminator; combine with --min-radius 50 (pin the protocol
        # radius) and --terminal-gate 40 so reward == protocol success
        guide = make_guide(
            cfg.env, terminate_radius=50.0,
            success_radius=cfg.eval.success_distance,
        )
    res = train_ppo(
        cfg,
        args.out,
        guide=guide,
        init_params=init_params,
        resume_from=args.resume,
        bank=_make_bank(args, cfg),
        sync_every=args.sync_every,
        capture_netcdf=args.netcdf,
        capture_conc_csv=args.conc_csv,
        write_csv=not args.no_csv,
        use_tensorboard=args.tensorboard,
        max_iterations=args.iterations,
        profile_steps=args.profile_steps,
        snapshot_every=args.snapshot_every,
    )
    print(
        json.dumps(
            {
                "episodes": res.episodes,
                "successes": res.successes,
                "success_rate": res.successes / max(res.episodes, 1),
                "env_steps": res.env_steps,
                "steps_per_sec": res.steps_per_sec,
                "out_dir": res.out_dir,
            }
        )
    )


def cmd_train_bc(args):
    from tpu_plume.core import get_preset
    from tpu_plume.train.bc import train_bc

    cfg = _apply_overrides(get_preset(args.preset), args)
    res = train_bc(
        cfg, args.out, args.expert,
        epochs=args.bc_epochs, batch_size=args.bc_batch, lr=args.bc_lr,
    )
    print(json.dumps({
        "samples": res.samples, "train_loss": round(res.train_loss, 4),
        "val_loss": round(res.val_loss, 4),
        "val_accuracy": round(res.val_accuracy, 4), "out": args.out,
    }))


def cmd_train_dagger(args):
    from tpu_plume.core import get_preset
    from tpu_plume.train.dagger import train_dagger

    cfg = _apply_overrides(get_preset(args.preset), args)
    res = train_dagger(
        cfg, args.out,
        oracle_kind=args.oracle, rounds=args.rounds,
        episodes_per_round=args.envs or 512,
        epochs_per_round=args.bc_epochs, batch_size=args.bc_batch,
        lr=args.bc_lr,
    )
    print(json.dumps({
        "rounds": res.rounds, "samples": res.samples,
        "val_accuracy": round(res.val_accuracy, 4),
        "rollout_success": [round(s, 4) for s in res.eval_success],
        "out": args.out,
    }))


def cmd_train_gail(args):
    from tpu_plume.core import get_preset
    from tpu_plume.train.gail_trainer import train_ppo_gail

    cfg = _apply_overrides(get_preset(args.preset), args)
    res = train_ppo_gail(
        cfg, args.out, args.expert,
        closed_loop=args.closed_loop, gail_reward_coef=args.gail_coef,
        gail_anneal_episodes=args.gail_anneal,
        gail_anneal_radius=args.gail_anneal_radius,
        max_iterations=args.iterations,
    )
    print(json.dumps({"episodes": res.episodes, "successes": res.successes,
                      "out_dir": res.out_dir}))


def cmd_train_lstm(args):
    if args.variant == "params":
        if not (args.nc or args.flights):
            raise SystemExit("--variant params needs --nc or --flights")
    elif not args.nc:
        raise SystemExit(f"--variant {args.variant} needs --nc")
    from tpu_plume.data.datasets import load_raw_sequences, load_trajectory_segments
    from tpu_plume.train.lstm_trainer import (
        train_peak_stop_lstm,
        train_sequence_lstm,
        train_threshold_lstm,
    )

    if args.variant == "threshold":
        seqs, src = load_raw_sequences(args.nc)
        res = train_threshold_lstm(
            seqs, src, args.out, epochs=args.epochs, verbose=True
        )
        print(json.dumps({"final_loss": res.losses[-1], "r2": res.extra["r2"]}))
    elif args.variant == "v12":
        if args.nc.endswith(".csv"):
            from tpu_plume.data.conc_csv import load_conc_rows

            seqs, src = load_conc_rows(args.nc)
        else:
            seqs, src = load_raw_sequences(args.nc)
        res = train_sequence_lstm(seqs, src, args.out, epochs=args.epochs, verbose=True)
        print(json.dumps({"final_loss": res.losses[-1], "test_r2": res.extra["test_r2"]}))
    elif args.variant == "params":
        from tpu_plume.train.lstm_trainer import train_source_lstm

        res = train_source_lstm(
            args.nc, args.out, flights_path=args.flights,
            window=args.window, epochs=args.epochs, verbose=True,
            features=args.features, hidden=args.hidden_size,
        )
        print(json.dumps({
            "best_loss": res.extra["best_loss"],
            "val_mean_err_px": res.extra["val_mean_err_px"],
            "val_median_err_px": res.extra["val_median_err_px"],
        }))
    else:
        segs = load_trajectory_segments(args.nc, window_size=20)
        res = train_peak_stop_lstm(segs, args.out, epochs=args.epochs, verbose=True)
        print(json.dumps({"best_loss": res.extra["best_loss"]}))


def cmd_eval(args):
    import jax

    from tpu_plume.core import get_preset
    from tpu_plume.evaluation import evaluate_policy, make_heuristic_gate, summarize

    # eval must mirror train-time env/model overrides (--plume-model,
    # --obs-memory, --arch, --hidden) or the checkpoint won't fit the env
    cfg = _apply_overrides(get_preset(args.preset), args)
    if args.oracle:
        from tpu_plume.evaluation.oracle import make_oracle

        oracle = make_oracle(args.oracle, cfg.env)
        model, params = None, None
    else:
        oracle = None
        model, params = _load_params(args, cfg)
    stop_gate = None
    if args.stop == "heuristic":
        stop_gate = make_heuristic_gate(cfg.eval, cfg.env.conc_peak)
    elif args.stop in ("threshold", "peakstop"):
        stop_gate = _lstm_gate(args, cfg)
    from tpu_plume.models.recurrent import RecurrentActorCritic

    rnn = model if isinstance(model, RecurrentActorCritic) else None
    bank = _make_bank(args, cfg)
    guide = None
    if args.guide == "fit":
        from tpu_plume.evaluation.guidance import make_guide

        # Thresholds and dive geometry are DERIVED from the env physics
        # (sigma/TI/peak/move) and the protocol (terminator radius, success
        # distance) — see derive_guide_config.  A preset whose physics make
        # hover-outside guidance impossible (e.g. ppo_v2_1's sigma-15 plume
        # under the radius-50 protocol: readable only to ~40 px) raises a
        # clear error instead of silently chord-pinning.
        guide = make_guide(
            cfg.env,
            terminate_radius=args.goal_radius,
            success_radius=cfg.eval.success_distance,
            max_se=args.guide_max_se,
            # resuming serpentine contact search (aniso fit guide only;
            # negative disables, None keeps the config default of off)
            search_after=args.guide_search_after,
        )
    elif args.guide == "learned":
        import jax.numpy as jnp

        from tpu_plume.data.checkpoint import restore_checkpoint
        from tpu_plume.evaluation.learned_guide import make_learned_guide

        if not args.guide_ckpt:
            raise SystemExit("--guide learned requires --guide-ckpt "
                             "(train-lstm --variant params checkpoint)")
        from tpu_plume.evaluation.learned_guide import (
            derive_learned_guide_config,
            load_localizer_meta,
        )

        bundle = restore_checkpoint(args.guide_ckpt)
        gparams = jax.tree.map(jnp.asarray, bundle["params"])
        # arch/features ride in the meta so older 3-feature/32-hidden
        # checkpoints keep loading unchanged
        # Gate knobs: derived from the localizer's own measured val error
        # (localizer_meta.npz next to the checkpoint) unless overridden;
        # hand-tuned historical defaults only when the meta is absent.
        meta = load_localizer_meta(args.guide_ckpt)
        window = int(meta["window"]) if meta else 64
        if meta:
            derived = derive_learned_guide_config(
                meta["val_median_err_px"], window=window
            )
            print(
                f"learned-guide gate derived from localizer val error "
                f"{meta['val_median_err_px']:.1f} px: "
                f"stable_tol={derived['stable_tol']:.1f} "
                f"check_every={derived['check_every']} "
                f"min_window={derived['min_window']}"
            )
        else:
            derived = {"stable_tol": 6.0, "check_every": 8, "min_window": 16}
        guide = make_learned_guide(
            cfg.env, gparams,
            features=(str(meta.get("features", "xyc")) if meta else "xyc"),
            hidden=(int(meta.get("hidden", 32)) if meta else 32),
            window=window,
            terminate_radius=(50.0 if args.goal_radius is None
                              else args.goal_radius),
            success_radius=cfg.eval.success_distance,
            stable_tol=(derived["stable_tol"]
                        if args.guide_stable_tol is None
                        else args.guide_stable_tol),
            min_window=(derived["min_window"]
                        if args.guide_min_window is None
                        else args.guide_min_window),
            check_every=(derived["check_every"]
                         if args.guide_check_every is None
                         else args.guide_check_every),
        )
    elif args.guide == "bank":
        from tpu_plume.evaluation.bank_guide import make_bank_guide

        # the eval-time bank and its per-row sources are known (the
        # reference's evaluators assume the same class of field knowledge,
        # PPOV1.1/evaluate_model.py:25-37): identify the episode's row from
        # the flight's own samples, dive at the matched row's exact source
        if bank is None:
            raise SystemExit("--guide bank requires a gridded bank "
                             "(--bank / --synthesize-bank)")
        guide = make_bank_guide(
            cfg.env, int(bank.conc.shape[0]),
            terminate_radius=(50.0 if args.goal_radius is None
                              else args.goal_radius),
            success_radius=cfg.eval.success_distance,
            # shared gate-cadence knobs: min in-plume samples before the
            # identity gate may open, and the stability-check stride.
            # Defaults are the measured 1000-ep TPU winners (RESULTS.md
            # rim-guard study): commit on 2 reads, check every step,
            # search from step 50, rim guard on with a 400-step budget.
            min_contact=(2 if args.guide_min_window is None
                         else args.guide_min_window),
            check_every=(1 if args.guide_check_every is None
                         else args.guide_check_every),
            # deadline-margin gate default (round-5 LES evidence A/B +
            # wide validation): margin 1.5 with a 400-step deadline lifts
            # the off-family LES band +4-7pp (64.0 vs 58.9) and is
            # neutral-positive on-family (K=16 76.2 vs 75.8, K=64 55.5
            # vs 56.2) while raising match accuracy everywhere
            margin=(1.5 if args.guide_margin is None
                    else args.guide_margin),
            margin_until=(400 if args.guide_margin_until is None
                          else args.guide_margin_until),
            search_after=(50 if args.guide_search_after is None
                          else (None if args.guide_search_after < 0
                                else args.guide_search_after)),
            rim_guard=args.guide_rim_guard,
            rim_expire=args.guide_rim_expire,
            guard_top=args.guide_guard_top,
            entry_dive=args.guide_entry_dive,
            dive_bias=args.guide_dive_bias,
            sticky_target=args.guide_sticky_target,
        )
    n_eval = args.episodes or cfg.eval.episodes
    m = evaluate_policy(
        params, model.apply if model is not None else None,
        cfg.env, cfg.eval, jax.random.PRNGKey(args.seed or 0),
        num_episodes=args.episodes, stop_gate=stop_gate, greedy=not args.sample,
        goal_radius=args.goal_radius, bank=bank, rnn=rnn,
        guide=guide, oracle=oracle,
        track_trajectories=n_eval if (args.localize or args.save_flights) else 0,
    )
    if args.save_flights:
        import numpy as np

        os.makedirs(os.path.dirname(args.save_flights) or ".", exist_ok=True)
        np.savez_compressed(
            args.save_flights, trajectories=m.trajectories, sources=m.sources
        )
    summary = summarize(m)
    if args.guide == "bank" and m.guide_match is not None:
        import numpy as np

        gated = np.asarray(m.guide_fit_ok)
        correct = np.asarray(m.guide_match) == np.asarray(m.field_idx)
        summary["bank_gate_rate"] = float(gated.mean())
        summary["bank_match_accuracy"] = (
            float(correct[gated].mean()) if gated.any() else 0.0
        )
    if args.goal_radius is not None:
        import numpy as np

        # precision protocol: the bullseye rate (deviation within the
        # terminator itself) is the headline, not success@success_distance
        summary["bullseye_rate"] = float(
            (np.asarray(m.deviations) <= args.goal_radius).mean()
        )
    if args.localize:
        import jax.numpy as jnp
        import numpy as np

        from tpu_plume.data.checkpoint import restore_checkpoint
        from tpu_plume.evaluation.localize import localize_from_trajectories

        bundle = restore_checkpoint(args.localize)
        lparams = jax.tree.map(jnp.asarray, bundle["params"])
        pred = localize_from_trajectories(
            m.trajectories, lparams, window=args.localize_window,
            grid_size=cfg.env.grid_size, conc_peak=cfg.env.conc_peak,
        )
        err = np.linalg.norm(pred - m.sources, axis=-1)
        summary.update(
            {
                "localize_mean_err": float(err.mean()),
                "localize_median_err": float(np.median(err)),
                "localize_within_5": float((err <= 5.0).mean()),
                "localize_within_40": float((err <= 40.0).mean()),
            }
        )
        if m.guide_est is not None:
            # hybrid: the trilateration fit where it validated (err ~3-6
            # px), the learned localizer elsewhere
            hybrid = np.where(m.guide_fit_ok[:, None], m.guide_est, pred)
            herr = np.linalg.norm(hybrid - m.sources, axis=-1)
            summary.update(
                {
                    "hybrid_mean_err": float(herr.mean()),
                    "hybrid_median_err": float(np.median(herr)),
                    "hybrid_within_5": float((herr <= 5.0).mean()),
                    "hybrid_within_40": float((herr <= 40.0).mean()),
                }
            )
    if args.out:
        os.makedirs(args.out, exist_ok=True)
        m.save_npz(os.path.join(args.out, "validation_metrics.npz"))
        m.save_csv(os.path.join(args.out, "evaluation_results.csv"))
    print(json.dumps(summary))


def _lstm_gate(args, cfg):
    import jax
    import jax.numpy as jnp

    from tpu_plume.data.checkpoint import restore_checkpoint
    from tpu_plume.evaluation import make_peak_stop_gate, make_threshold_gate
    from tpu_plume.models import ConcentrationThresholdPredictor, PeakAndStopPredictor

    if not args.lstm_ckpt:
        raise SystemExit("--stop threshold/peakstop requires --lstm-ckpt")
    bundle = restore_checkpoint(args.lstm_ckpt)
    lstm_params = jax.tree.map(jnp.asarray, bundle["params"])
    if args.stop == "threshold":
        from tpu_plume.data.scaler import MinMaxScaler

        scaler_path = os.path.join(os.path.dirname(args.lstm_ckpt), "scaler_params.npy")
        scaler = MinMaxScaler.load(scaler_path)
        model = ConcentrationThresholdPredictor()
        lo = jnp.float32(scaler.data_min_)
        scale = jnp.float32(scaler._scale)

        def predict(window):
            scaled = (window - lo) * scale
            return model.apply(lstm_params, scaled[None, :])[0]

        return make_threshold_gate(predict, cfg.stop)
    model = PeakAndStopPredictor()

    def predict(window_norm):
        peak, stop = model.apply(lstm_params, window_norm[None, :])
        return peak[0], stop[0]

    return make_peak_stop_gate(predict, cfg.stop)


def cmd_expert(args):
    import jax

    from tpu_plume.core import get_preset
    from tpu_plume.evaluation import generate_expert_data

    cfg = _apply_overrides(get_preset(args.preset), args)
    if args.oracle:
        from tpu_plume.evaluation.oracle import make_oracle

        oracle = make_oracle(args.oracle, cfg.env)
        params, apply_fn, rnn = None, None, None
    else:
        model, params = _load_params(args, cfg)
        from tpu_plume.models.recurrent import RecurrentActorCritic

        rnn = model if isinstance(model, RecurrentActorCritic) else None
        apply_fn, oracle = model.apply, None
    states, actions = generate_expert_data(
        params, apply_fn, cfg.env, jax.random.PRNGKey(args.seed or 0),
        num_episodes=args.episodes or 100, path=args.out,
        bank=_make_bank(args, cfg), rnn=rnn, oracle=oracle,
    )
    print(json.dumps({"samples": int(states.shape[0]), "path": args.out}))


def cmd_plot(args):
    if args.what == "field":
        from tpu_plume.viz import plot_gaussian_field

        path = plot_gaussian_field(args.nc, args.episode, save_path=args.out)
    else:
        from tpu_plume.viz import plot_training_curves

        path = plot_training_curves(args.csv, save_path=args.out)
    print(json.dumps({"saved": path}))


def cmd_flux(args):
    import dataclasses

    import jax

    from tpu_plume.core import get_preset
    from tpu_plume.evaluation import flux_inversion_study

    cfg = get_preset(args.preset)
    env = dataclasses.replace(
        cfg.env, num_sources=args.sources,
        plume_model=args.plume_model or cfg.env.plume_model,
    )
    policy = params = oracle = None
    if args.survey == "raster":
        from tpu_plume.evaluation.oracle import make_oracle

        scale = 1.12
        if args.refine_steps:
            # widen the pass-1 bands so the shortened budget still covers
            # the whole domain: descend (g/m steps) + n_bands * (g/m + 1)
            g, m = env.grid_size, env.move_step
            sweep = max(args.steps - args.refine_steps - g / m, 1.0)
            n_bands = max(sweep / (g / m + 1.0), 1.0)
            scale = max(1.12, g / n_bands / env.plume_sigma)
        oracle = make_oracle("raster", env, raster_band_scale=scale)
    elif args.ckpt or args.pth:
        model, params = _load_params(args, cfg)
        policy = model.apply
    out = flux_inversion_study(
        env, jax.random.PRNGKey(args.seed or 0),
        num_episodes=args.episodes or 64, num_steps=args.steps,
        policy=policy, params=params,
        estimated_positions=args.estimated, oracle=oracle,
        refine_steps=args.refine_steps,
    )
    print(json.dumps(out))


def cmd_inspect_nc(args):
    from tpu_plume.data.netcdf import describe_nc

    print(describe_nc(args.path))


def build_parser():
    p = argparse.ArgumentParser(prog="tpu_plume")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp, out_default=None):
        sp.add_argument("--preset", default="ppo_v2_0")
        sp.add_argument("--out", default=out_default)
        sp.add_argument("--plume-model",
                        choices=["isotropic", "anisotropic", "gridded"],
                        help="override the preset's plume model")
        sp.add_argument("--bank", help="WRF-LES NetCDF field bank to ingest "
                        "(plume_model=gridded)")
        sp.add_argument("--synth-bank", choices=["static", "time", "3d", "les"],
                        help="procedurally synthesize a gridded field bank")
        sp.add_argument("--bank-fields", type=int, help="bank rows K")
        sp.add_argument("--bank-frames", type=int, help="time frames T")
        sp.add_argument("--bank-levels", type=int, help="z levels Z (3d)")
        sp.add_argument("--bank-spf", type=float, help="env steps per frame")
        sp.add_argument("--bank-seed", type=int, default=0)
        sp.add_argument("--episodes", type=int)
        sp.add_argument("--envs", type=int)
        sp.add_argument("--unroll", type=int)
        sp.add_argument("--minibatch", type=int)
        sp.add_argument("--iterations", type=int)
        sp.add_argument("--seed", type=int)
        sp.add_argument("--debug-nans", action="store_true",
                        help="enable jax_debug_nans (find the op producing NaNs)")
        sp.add_argument("--cpu", action="store_true",
                        help="force the CPU backend (the environment pins "
                             "JAX_PLATFORMS=axon before the env var is "
                             "readable, so an env override alone is not "
                             "enough)")
        sp.add_argument("--lr", type=float)
        sp.add_argument("--entropy", type=float)
        sp.add_argument("--ln-lstm", action="store_true",
                        help="LayerNorm-LSTM cell for --arch lstm")
        sp.add_argument("--shuffle-mode",
                        choices=["roll", "permutation", "affine"],
                        help="PPO minibatch shuffle: circular rotation "
                             "(default; zero gather cost), full random "
                             "permutation (reference semantics, "
                             "train_ppo2.0.py:44-46), or an O(1) affine "
                             "bijection")
        sp.add_argument("--depth-coef", type=float,
                        help="terminal goal-ball crossing-depth bonus coef "
                             "(EnvConfig.terminal_depth_coef; default 0 = "
                             "reference parity)")
        sp.add_argument("--depth-power", type=float,
                        help="exponent on the normalized crossing depth "
                             "(EnvConfig.terminal_depth_power; >1 pays "
                             "grazes ~nothing, keeping a smooth gradient)")
        sp.add_argument("--terminal-gate", type=float,
                        help="success-gated terminal bonus: pay the whole "
                             "terminal bonus only when the crossing lands "
                             "within this distance of the source "
                             "(EnvConfig.terminal_gate_radius; 40 = the "
                             "reference eval metric; default 0 = off)")
        sp.add_argument("--reward", choices=["v1_0", "v1_1", "delta"],
                        help="reward form: v1_1 (reference code), v1_0, or "
                             "delta (the reference README's own "
                             "R = dCH4 - 0.2*|dtheta| spec its code never "
                             "implemented)")
        sp.add_argument("--obs-memory", action="store_true",
                        help="append [dconc, prev-action one-hot] to the obs "
                             "(run-and-tumble chemotaxis; off = reference "
                             "parity)")
        sp.add_argument("--inplume-bonus", type=float,
                        help="per-step bonus while conc/peak >= 0.06 "
                             "(EnvConfig.inplume_bonus): trains contact-"
                             "riding so the model-fit guide gets samples "
                             "on narrow anisotropic ridges; default 0 = "
                             "reference parity")
        sp.add_argument("--distill", choices=["naive", "look1", "phase"],
                        help="distilled PPO: a scripted privileged teacher "
                             "labels every rollout state on device and the "
                             "update adds an imitation cross-entropy "
                             "(on-policy DAgger composed with the RL loss)")
        sp.add_argument("--distill-coef", type=float,
                        help="imitation-term weight (default 0.1)")
        sp.add_argument("--distill-gate", type=float,
                        help="imitate only where conc_norm exceeds this "
                             "(far-field teacher moves are privileged-"
                             "direction noise; default 0 = everywhere)")
        sp.add_argument("--min-radius", type=float,
                        help="curriculum radius floor (set 50 to train at the "
                             "fixed reference-protocol radius)")
        sp.add_argument("--train-guide", choices=["fit"], default=None,
                        help="run the eval-time terminal guide INSIDE the "
                             "training rollout (policy-in-the-loop "
                             "fine-tuning): overridden steps drop out of "
                             "the policy surrogate, rewards/values see the "
                             "guided dynamics.  Pair with --min-radius 50 "
                             "--terminal-gate 40 so reward = protocol "
                             "success")
        sp.add_argument("--bf16", action="store_true")
        sp.add_argument("--bf16-update", action="store_true",
                        help="bfloat16 compute in the PPO update only "
                             "(f32 rollout + f32 params) — the mixed "
                             "split for quality-sensitive physics")
        sp.add_argument("--f32-heads", action="store_true",
                        help="keep the actor/critic heads in f32 under "
                             "--bf16/--bf16-update (terminal-precision "
                             "recovery; free — heads are 128->5/128->1)")
        sp.add_argument("--hidden",
                        help='trunk widths, e.g. "512,256" (default 256,128 '
                             "— the reference architecture)")
        sp.add_argument("--arch", choices=["mlp", "lstm"],
                        help="policy architecture: mlp (reference parity) or "
                             "lstm (recurrent PPO+LSTM policy — memory "
                             "enables concentration-gradient chemotaxis)")
        sp.add_argument("--ckpt")
        sp.add_argument("--pth")

    sp = sub.add_parser("train", help="PPO training")
    common(sp, "runs/train")
    sp.add_argument("--netcdf", action="store_true", help="capture training_data.nc")
    sp.add_argument("--conc-csv", action="store_true",
                    help="capture ragged conc sequences (V1.2 data.csv)")
    sp.add_argument("--tensorboard", action="store_true")
    sp.add_argument("--profile-steps", type=int, default=0,
                    help="capture a jax.profiler trace over N train steps")
    sp.add_argument("--snapshot-every", type=int,
                    help="save a full resume bundle every >= N iterations "
                         "(at drain-window boundaries)")
    sp.add_argument("--resume", metavar="DIR",
                    help="resume an interrupted run from a full-bundle "
                         "checkpoint dir (checkpoint_iterNNNNNN or the "
                         "end-of-run checkpoint); restores params, optimizer, "
                         "env states, curriculum, PRNG and counters — "
                         "bit-exact continuation, CSV logs append")
    sp.add_argument("--no-csv", action="store_true",
                    help="skip per-episode CSV drain (pure-throughput training)")
    sp.add_argument("--sync-every", type=int,
                    help="host<->device sync interval (pipeline depth); "
                         "default 8 (record drains ride the packed "
                         "per-window transfer)")
    sp.set_defaults(fn=cmd_train)

    sp = sub.add_parser(
        "train-bc",
        help="behavior-cloning pretrain on expert pairs (warm start for "
             "train --ckpt)",
    )
    common(sp, "runs/bc")
    sp.add_argument("--expert", required=True)
    sp.add_argument("--bc-epochs", type=int, default=30)
    sp.add_argument("--bc-batch", type=int, default=4096)
    sp.add_argument("--bc-lr", type=float, default=1e-3)
    sp.set_defaults(fn=cmd_train_bc)

    sp = sub.add_parser(
        "train-dagger",
        help="DAgger against a scripted oracle teacher (closed-loop "
             "imitation; --envs = episodes/round)",
    )
    common(sp, "runs/dagger")
    sp.add_argument("--oracle", choices=["naive", "look1", "phase"],
                    default="phase")
    sp.add_argument("--rounds", type=int, default=8)
    sp.add_argument("--bc-epochs", type=int, default=20)
    sp.add_argument("--bc-batch", type=int, default=4096)
    sp.add_argument("--bc-lr", type=float, default=1e-3)
    sp.set_defaults(fn=cmd_train_dagger)

    sp = sub.add_parser("train-gail", help="PPO + GAIL discriminator")
    common(sp, "runs/gail")
    sp.add_argument("--expert", required=True)
    sp.add_argument("--closed-loop", action="store_true")
    sp.add_argument("--gail-coef", type=float, default=0.1,
                    help="imitation-reward weight (closed loop only)")
    sp.add_argument("--gail-anneal", type=int,
                    help="linearly decay the imitation weight to 0 over N "
                         "episodes (bootstrap without the expert-capped "
                         "asymptote)")
    sp.add_argument("--gail-anneal-radius", type=float,
                    help="start the --gail-anneal decay only once the "
                         "curriculum radius first reaches this value "
                         "(event-triggered; default: decay from episode 0, "
                         "which measured as forfeiting the bootstrap)")
    sp.set_defaults(fn=cmd_train_gail)

    sp = sub.add_parser("train-lstm", help="LSTM stop-predictor training")
    sp.add_argument("--variant",
                    choices=["threshold", "peakstop", "v12", "params"],
                    default="threshold")
    sp.add_argument("--window", type=int, default=64,
                    help="window length for --variant params (the source "
                         "localizer)")
    sp.add_argument("--nc",
                    help="NC trajectory capture (required unless --flights)")
    sp.add_argument("--flights",
                    help="flights.npz from `eval --save-flights` — "
                         "distribution-matched localizer training data "
                         "(--variant params only)")
    sp.add_argument("--out", default="runs/lstm")
    sp.add_argument("--epochs", type=int, default=150)
    sp.add_argument("--features", choices=["xyc", "xycd"], default="xyc",
                    help="--variant params window features: xyc = "
                         "normalized (x, y, conc); xycd appends per-step "
                         "deltas (dx, dy, dconc) — explicit motion/"
                         "gradient inputs (round-5 estimator study)")
    sp.add_argument("--hidden-size", type=int, default=32,
                    help="--variant params LSTM cell/head width "
                         "(persisted in localizer_meta.npz; eval derives "
                         "the model from it)")
    sp.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (see train --cpu)")
    sp.set_defaults(fn=cmd_train_lstm)

    sp = sub.add_parser("eval", help="greedy evaluation harness")
    common(sp, None)
    sp.add_argument("--oracle",
                    choices=["naive", "look1", "phase", "raster"],
                    help="evaluate a scripted policy instead of a "
                         "checkpoint: naive/look1/phase are privileged "
                         "teachers (protocol ceiling measurement); raster "
                         "is a non-privileged boustrophedon surveyor "
                         "(compose with --guide fit for the zero-learned-"
                         "components system)")
    sp.add_argument("--stop", choices=["none", "heuristic", "threshold", "peakstop"],
                    default="none")
    sp.add_argument("--lstm-ckpt")
    sp.add_argument("--sample", action="store_true",
                    help="sample actions instead of greedy argmax")
    sp.add_argument("--goal-radius", type=float,
                    help="episode-termination radius (default: INITIAL_RADIUS=50, "
                         "the reference protocol; set 5.0 for the precision metric)")
    sp.add_argument("--save-flights",
                    help="write flights.npz (trajectories + true sources) "
                         "for localizer training — the self-localization "
                         "loop: eval --save-flights -> train-lstm --variant "
                         "params --flights -> eval --localize")
    sp.add_argument("--localize",
                    help="checkpoint dir of a trained source localizer "
                         "(train-lstm --variant params): post-hoc predict "
                         "each flight's source from its own (x, y, conc) "
                         "history and report the localization error "
                         "alongside the endpoint deviation")
    sp.add_argument("--localize-window", type=int, default=64)
    sp.add_argument("--guide", choices=["none", "fit", "learned", "bank"],
                    default="none",
                    help="terminal guidance: 'fit' trilaterates the source "
                         "online from the agent's own concentration samples "
                         "and phase-controls the goal-ball crossing "
                         "(evaluation.guidance; isotropic fields only); "
                         "'learned' runs a trained source-localizer LSTM "
                         "(--guide-ckpt) inside the eval scan and drives "
                         "the same phase controller — works on anisotropic "
                         "and gridded fields (evaluation.learned_guide); "
                         "'bank' identifies the episode's gridded-bank row "
                         "from the flight's own samples and dives at the "
                         "matched row's known source (evaluation.bank_guide; "
                         "gridded banks only). "
                         "Reported separately from protocol-faithful rows")
    sp.add_argument("--guide-ckpt",
                    help="localizer checkpoint dir for --guide learned "
                         "(from train-lstm --variant params)")
    sp.add_argument("--guide-stable-tol", type=float, default=None,
                    help="px agreement between consecutive localizer "
                         "estimates required to open the learned gate "
                         "(default: derived from the localizer's measured "
                         "val error in localizer_meta.npz)")
    sp.add_argument("--guide-min-window", type=int, default=None,
                    help="flight steps before the learned localizer runs "
                         "its first stability check (default: derived; "
                         "lower it on configs whose episodes terminate in "
                         "<100 steps)")
    sp.add_argument("--guide-check-every", type=int, default=None,
                    help="steps between learned-localizer stability checks "
                         "(default: derived)")
    sp.add_argument("--guide-margin", type=float, default=None,
                    help="--guide bank score-margin gate: commit only when "
                         "the runner-up row's accumulated error exceeds the "
                         "best row's by this ratio (default 1.5 with the "
                         "400-step deadline; 1.0 = identity stability "
                         "only; scale-free, ~1 under pure noise)")
    sp.add_argument("--guide-margin-until", type=int, default=None,
                    help="--guide bank: require the score margin only "
                         "before this flight step; after the deadline the "
                         "gate reverts to identity-stability only (0 = "
                         "margin always required; default 400).  Keeps "
                         "the margin's 97-98%% gated accuracy without its "
                         "gate starvation on evidence-poor flights")
    sp.add_argument("--guide-search-after", type=int, default=None,
                    help="contact-search fallback: with no in-plume sample "
                         "for this many steps, steer a resuming serpentine "
                         "survey until contact.  --guide bank: default 50; "
                         "negative disables.  --guide fit (anisotropic "
                         "only): default off; pass a positive value to "
                         "enable")
    sp.add_argument("--guide-rim-guard", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="--guide bank: while unidentified, deflect policy "
                         "steps that would land inside any candidate row's "
                         "terminate ball, and steer toward the top-2 rows' "
                         "max-disagreement cell once contact is established "
                         "(default on; --no-guide-rim-guard to disable)")
    sp.add_argument("--guide-guard-top", type=int, default=0,
                    help="--guide bank: restrict the rim guard to the "
                         "top-N scored rows' balls once contact exists "
                         "(0 = guard all rows; use on large banks where "
                         "the avoid balls tile the domain, e.g. K=64)")
    sp.add_argument("--guide-entry-dive",
                    action=argparse.BooleanOptionalAction, default=False,
                    help="--guide bank: replace the rim guard's blanket "
                         "ball deflection with the local entry rule — "
                         "forbid only shallow-chord landings (the 42-49 px "
                         "guaranteed-loss band) and convert imminent ball "
                         "entries into deep radial dives (success-quality "
                         "if the ball is true, free if wrong).  Scales to "
                         "banks whose terminate balls tile the domain "
                         "(K=64)")
    sp.add_argument("--guide-dive-bias",
                    action=argparse.BooleanOptionalAction, default=False,
                    help="--guide bank: when an ungated move already "
                         "enters the nearest candidate ball, substitute "
                         "the deepest of the five landings if one lands "
                         "<= deep_take (measured neutral at K=64 — "
                         "RESULTS.md round-5 accounting; default off)")
    sp.add_argument("--guide-sticky-target",
                    action=argparse.BooleanOptionalAction, default=False,
                    help="--guide bank: seat the dive row at gate-open and "
                         "reseat only on a 1.3x score margin (measured "
                         "neutral at K=64; default off)")
    sp.add_argument("--guide-rim-expire", type=int, default=400,
                    help="rim guard fail-open budget in steps (after this "
                         "many steps an unidentified episode hands control "
                         "back to the policy; default 400)")
    sp.add_argument("--guide-max-se", type=float, default=None,
                    help="override the --guide fit validation gate "
                         "(posterior worst-direction standard error, px): "
                         "higher = steer more episodes on looser fits")
    sp.set_defaults(fn=cmd_eval)

    sp = sub.add_parser("expert", help="generate expert demonstrations")
    common(sp, "expert_data.npz")
    sp.add_argument("--oracle", choices=["naive", "look1", "phase"],
                    help="privileged scripted teacher (true source known) "
                         "instead of a trained checkpoint; 'phase' "
                         "demonstrates approach-phase control (the measured "
                         "42%%->85%% success@40 headroom)")
    sp.set_defaults(fn=cmd_expert)

    sp = sub.add_parser(
        "flux", help="flux-inversion study (README <20%% error goal)"
    )
    common(sp, None)
    sp.add_argument("--sources", type=int, default=3)
    sp.add_argument("--steps", type=int, default=400,
                    help="survey steps per episode")
    sp.add_argument("--estimated", action="store_true",
                    help="END-TO-END pipeline: estimate source positions "
                         "from the flight data (no oracle positions) and "
                         "report joint position+strength error")
    sp.add_argument("--survey", choices=["random", "raster"],
                    default="random",
                    help="survey track: 'raster' flies the non-privileged "
                         "boustrophedon surveyor (coverage-designed — "
                         "every dispersion band visited) instead of the "
                         "random walk / trained policy")
    sp.add_argument("--refine-steps", type=int, default=0,
                    help="two-pass survey: reserve this many of --steps "
                         "for pass-2 refinement orbits around the pass-1 "
                         "position estimates (same total budget)")
    sp.set_defaults(fn=cmd_flux)

    sp = sub.add_parser("inspect-nc", help="dump NetCDF dataset schema")
    sp.add_argument("path")
    sp.set_defaults(fn=cmd_inspect_nc)

    sp = sub.add_parser("plot", help="trajectory-field / training-curve plots")
    sp.add_argument("--what", choices=["field", "curves"], default="field")
    sp.add_argument("--nc", help="training_data.nc (field plot)")
    sp.add_argument("--csv", help="training_results.csv (curves plot)")
    sp.add_argument("--episode", type=int, default=0)
    sp.add_argument("--out", default="plot.png")
    sp.set_defaults(fn=cmd_plot)
    return p


def _enable_compile_cache():
    import os

    try:
        import jax

        cache = os.environ.get(
            "TPU_PLUME_JAX_CACHE", os.path.expanduser("~/.cache/tpu_plume_jax")
        )
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    except Exception:
        pass


def main(argv=None):
    args = build_parser().parse_args(argv)
    _enable_compile_cache()
    if getattr(args, "cpu", False):
        import jax

        jax.config.update("jax_platforms", "cpu")
    if getattr(args, "debug_nans", False):
        import jax

        jax.config.update("jax_debug_nans", True)
    args.fn(args)


if __name__ == "__main__":
    main()
