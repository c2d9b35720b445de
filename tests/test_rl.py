"""GAE / PPO-update / curriculum tests (tpu_plume.rl)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training.train_state import TrainState

from tpu_plume.core.config import CurriculumConfig, PPOConfig
from tpu_plume.models import ActorCritic
from tpu_plume.rl import (
    PPOBatch,
    compute_gae,
    curriculum_init,
    curriculum_update,
    ppo_loss,
    ppo_update,
)
from tpu_plume.rl.ppo import normalize_advantages


def _np_gae(rewards, values, dones, bootstrap, gamma, lam):
    T = len(rewards)
    adv = np.zeros(T)
    last_adv, next_v = 0.0, bootstrap
    for t in reversed(range(T)):
        nonterm = 1.0 - dones[t]
        delta = rewards[t] + gamma * next_v * nonterm - values[t]
        last_adv = delta + gamma * lam * nonterm * last_adv
        adv[t] = last_adv
        next_v = values[t]
    return adv, adv + values


def test_gae_matches_reference_loop():
    rng = np.random.RandomState(0)
    T, N = 37, 3
    rewards = rng.randn(T, N).astype(np.float32)
    values = rng.randn(T, N).astype(np.float32)
    dones = (rng.rand(T, N) < 0.1).astype(np.float32)
    boot = rng.randn(N).astype(np.float32)
    adv, ret = compute_gae(jnp.array(rewards), jnp.array(values), jnp.array(dones),
                           jnp.array(boot), 0.99, 0.95)
    for n in range(N):
        ref_adv, ref_ret = _np_gae(rewards[:, n], values[:, n], dones[:, n], boot[n], 0.99, 0.95)
        np.testing.assert_allclose(np.asarray(adv)[:, n], ref_adv, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(ret)[:, n], ref_ret, rtol=1e-5, atol=1e-5)


def test_gae_masks_episode_boundary():
    """A reward after a done must not leak into advantages before it."""
    T = 6
    rewards = jnp.zeros((T, 1)).at[5, 0].set(100.0)
    values = jnp.zeros((T, 1))
    dones = jnp.zeros((T, 1)).at[2, 0].set(1.0)
    adv, _ = compute_gae(rewards, values, dones, jnp.array([0.0]), 0.99, 0.95)
    assert float(jnp.abs(adv[:3]).max()) < 1e-6 + float(adv[2, 0])  # steps 0-2 see nothing of r5
    assert float(adv[5, 0]) == 100.0


def test_advantage_normalization_guard():
    cfg = PPOConfig()
    a = jnp.ones(8)  # zero variance -> guard kicks in
    out = normalize_advantages(a, cfg)
    assert np.all(np.isfinite(np.asarray(out)))
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


def _make_state_and_batch(B=512, key=jax.random.PRNGKey(0), **cfg_kw):
    cfg = PPOConfig(
        minibatch_size=128, epochs=2, learning_rate=1e-3,
        shuffle_mode=cfg_kw.pop("shuffle_mode", "sort"), **cfg_kw,
    )
    model = ActorCritic()
    k1, k2, k3 = jax.random.split(key, 3)
    params = model.init(k1, jnp.zeros((1, 6)))
    tx = optax.chain(optax.clip_by_global_norm(cfg.max_grad_norm),
                     optax.adam(cfg.learning_rate))
    ts = TrainState.create(apply_fn=model.apply, params=params, tx=tx)
    obs = jax.random.uniform(k2, (B, 6))
    logits, values = model.apply(params, obs)
    actions = jax.random.categorical(k3, logits)
    logp = jnp.take_along_axis(jax.nn.log_softmax(logits), actions[:, None], -1).squeeze(-1)
    adv = jax.random.normal(k3, (B,))
    batch = PPOBatch(obs=obs, actions=actions, old_log_probs=logp,
                     advantages=normalize_advantages(adv, cfg),
                     returns=values + adv, old_values=values)
    return cfg, ts, batch


def test_ppo_loss_zero_at_old_policy():
    """At the old params with zero advantages, policy loss is 0 and ratio=1."""
    cfg, ts, batch = _make_state_and_batch()
    batch = batch.replace(advantages=jnp.zeros_like(batch.advantages))
    _, metrics = ppo_loss(ts.params, ts.apply_fn, batch, cfg)
    np.testing.assert_allclose(float(metrics["loss/policy"]), 0.0, atol=1e-6)
    np.testing.assert_allclose(float(metrics["loss/approx_kl"]), 0.0, atol=1e-6)
    np.testing.assert_allclose(float(metrics["loss/clip_frac"]), 0.0, atol=1e-6)


def test_ppo_update_reduces_value_loss():
    cfg, ts, batch = _make_state_and_batch()
    _, m0 = ppo_loss(ts.params, ts.apply_fn, batch, cfg)
    ts2, metrics = jax.jit(ppo_update, static_argnames="cfg")(ts, batch, jax.random.PRNGKey(9), cfg)
    _, m1 = ppo_loss(ts2.params, ts2.apply_fn, batch, cfg)
    assert float(m1["loss/value"]) < float(m0["loss/value"])
    assert int(ts2.step) == cfg.epochs * (512 // cfg.minibatch_size)


def test_ppo_update_affine_shuffle():
    """The O(1) affine shuffle must behave like a real permutation: the
    update runs, steps count, and repeated updates reduce total loss."""
    cfg, ts, batch = _make_state_and_batch(shuffle_mode="affine")
    _, m0 = ppo_loss(ts.params, ts.apply_fn, batch, cfg)
    for i in range(4):
        ts, _ = jax.jit(ppo_update, static_argnames="cfg")(
            ts, batch, jax.random.PRNGKey(i), cfg
        )
    _, m1 = ppo_loss(ts.params, ts.apply_fn, batch, cfg)
    assert float(m1["loss/total"]) < float(m0["loss/total"])
    assert int(ts.step) == 4 * cfg.epochs * (512 // cfg.minibatch_size)


def test_ppo_update_bf16_compute():
    """bf16 trunk still optimizes (params stay f32)."""
    import optax
    from flax.training.train_state import TrainState

    from tpu_plume.models import ActorCritic

    cfg = PPOConfig(minibatch_size=128, epochs=2, learning_rate=1e-3,
                    bf16_compute=True)
    model = ActorCritic(dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 6)))
    assert params["params"]["Dense_0"]["kernel"].dtype == jnp.float32
    tx = optax.adam(cfg.learning_rate)
    ts = TrainState.create(apply_fn=model.apply, params=params, tx=tx)
    _, ts0, batch = _make_state_and_batch()
    batch = batch.replace(
        old_log_probs=jnp.zeros_like(batch.old_log_probs),
        old_values=jnp.zeros_like(batch.old_values),
    )
    logits, values = model.apply(params, batch.obs)
    assert logits.dtype == jnp.float32  # outputs cast back
    ts2, metrics = jax.jit(ppo_update, static_argnames="cfg")(
        ts, batch, jax.random.PRNGKey(1), cfg
    )
    assert np.isfinite(float(metrics["loss/total"]))


def test_curriculum_window_and_shrink():
    cfg = CurriculumConfig()
    st = curriculum_init(cfg, 0.6)
    # 119 episodes: no fire
    st = curriculum_update(st, jnp.int32(119), jnp.int32(119), cfg)
    assert float(st.radius) == 50.0 and int(st.num_updates) == 0
    # 1 more success -> window fires at rate 1.0: raw shrink 50*0.9^3.2=35.7,
    # anti-oscillation clamps to 45 (reference model.py:146-161)
    st = curriculum_update(st, jnp.int32(1), jnp.int32(1), cfg)
    np.testing.assert_allclose(float(st.radius), 45.0, rtol=1e-6)
    assert int(st.num_updates) == 1 and int(st.episode_count) == 0
    # explore bonus decayed by 0.999^2
    np.testing.assert_allclose(float(st.explore_bonus), 0.6 * 0.999**2, rtol=1e-5)


def test_curriculum_expand_and_floor():
    cfg = CurriculumConfig()
    st = curriculum_init(cfg, 0.11)
    st = st.replace(radius=jnp.float32(30.0))
    # rate 0 < 0.25 -> expand by 1.1 (diff 3 < clamp 5)
    st = curriculum_update(st, jnp.int32(0), jnp.int32(120), cfg)
    np.testing.assert_allclose(float(st.radius), 33.0, rtol=1e-6)
    # bonus floor 0.1
    assert float(st.explore_bonus) >= 0.1 - 1e-7
    # radius floor: from 5.5 with rate 1 -> shrink below min clamps to 5
    st = st.replace(radius=jnp.float32(5.5))
    st = curriculum_update(st, jnp.int32(120), jnp.int32(120), cfg)
    assert float(st.radius) >= cfg.min_radius - 1e-6


def test_curriculum_mid_band_holds():
    cfg = CurriculumConfig()
    st = curriculum_init(cfg, 0.6)
    st = curriculum_update(st, jnp.int32(48), jnp.int32(120), cfg)  # rate 0.4
    assert float(st.radius) == 50.0


def test_curriculum_simple_variant():
    """V1.0 controller (ppo0.0.py:261-287): per-episode explore decay,
    shrink-only radius."""
    cfg = CurriculumConfig(variant="simple")
    st = curriculum_init(cfg, 0.6)
    # explore bonus decays with every episode, even before the window fills
    st = curriculum_update(st, jnp.int32(5), jnp.int32(10), cfg)
    np.testing.assert_allclose(float(st.explore_bonus), 0.6 * 0.999**10, rtol=1e-5)
    assert float(st.radius) == 50.0
    # window fills with high success -> single decay step, no anti-osc clamp
    st = curriculum_update(st, jnp.int32(110), jnp.int32(110), cfg)
    np.testing.assert_allclose(float(st.radius), 45.0, rtol=1e-6)  # 50*0.9
    # low success rate never expands
    st = curriculum_update(st, jnp.int32(0), jnp.int32(120), cfg)
    np.testing.assert_allclose(float(st.radius), 45.0, rtol=1e-6)


def test_curriculum_large_batch_multi_fire():
    """At 4096-env scale one iteration completes many windows' worth of
    episodes (VERDICT r1 weak #3): the controller must fire once per
    completed window — count // window_size times — not once per call,
    preserving the reference's per-120-episode decay cadence
    (PPOV1.1/model.py:121-164)."""
    cfg = CurriculumConfig(window_size=120)
    st = curriculum_init(cfg, 0.6)
    # 900 episodes at 80% success in ONE call = 7 windows + remainder 60
    st_big = curriculum_update(st, jnp.int32(720), jnp.int32(900), cfg)
    assert int(st_big.num_updates) == 7
    assert int(st_big.episode_count) == 900 - 7 * 120
    # remainder successes are proportional
    assert int(st_big.success_count) == round(0.8 * 60)

    # serial equivalence: 7 window-exact calls at the same rate
    st_serial = curriculum_init(cfg, 0.6)
    for _ in range(7):
        st_serial = curriculum_update(st_serial, jnp.int32(96), jnp.int32(120), cfg)
    np.testing.assert_allclose(
        float(st_big.radius), float(st_serial.radius), rtol=1e-6
    )
    np.testing.assert_allclose(
        float(st_big.explore_bonus), float(st_serial.explore_bonus), rtol=1e-6
    )
    # monotone progression vs the old single-fire behavior
    st_single = curriculum_update(st, jnp.int32(96), jnp.int32(120), cfg)
    assert float(st_big.radius) < float(st_single.radius)


def test_curriculum_simple_large_batch():
    cfg = CurriculumConfig(variant="simple", window_size=100, radius_decay=0.9)
    st = curriculum_init(cfg, 0.6)
    st2 = curriculum_update(st, jnp.int32(280), jnp.int32(350), cfg)  # 3 windows
    np.testing.assert_allclose(float(st2.radius), 50.0 * 0.9**3, rtol=1e-6)
    assert int(st2.episode_count) == 50
    assert int(st2.num_updates) == 3


def test_distilled_ppo_mechanism():
    """Distilled PPO wiring: the rollout labels states with the teacher,
    the update carries loss/distill, gradient descent on the composed loss
    REDUCES the imitation cross-entropy over iterations, and the control
    (distill off) carries no such stat.  (Emergent success@40 behavior is
    a TPU-scale study, not a unit assertion.)"""
    import jax

    from tpu_plume.core.config import (
        CurriculumConfig,
        EnvConfig,
        PPOConfig,
        RolloutConfig,
        TrainConfig,
    )
    from tpu_plume.rl.curriculum import curriculum_init
    from tpu_plume.rollout.rollout import init_rollout
    from tpu_plume.train.ppo_trainer import (
        LoopCarry,
        build_train_step,
        make_train_state,
    )

    def cfg_for(distill, gate=0.0):
        return TrainConfig(
            name="ppo_v2_0",
            env=EnvConfig(max_steps=50, plume_sigma=500 / 16, obs_memory=True),
            ppo=PPOConfig(minibatch_size=256, epochs=2, learning_rate=3e-4,
                          distill_oracle=distill, distill_coef=2.0,
                          distill_conc_gate=gate),
            curriculum=CurriculumConfig(window_size=64),
            rollout=RolloutConfig(num_envs=32, unroll_length=32),
            total_episodes=10**6, seed=0,
        )

    def run(distill, iters=12, gate=0.0):
        cfg = cfg_for(distill, gate)
        ts = make_train_state(cfg, jax.random.PRNGKey(0))
        cur = curriculum_init(cfg.curriculum, cfg.env.explore_bonus_init)
        ro = init_rollout(jax.random.PRNGKey(1), cfg.env,
                          cfg.rollout.num_envs, radius=50.0,
                          explore_bonus=cfg.env.explore_bonus_init)
        loop = LoopCarry(train_state=ts, rollout=ro, curriculum=cur,
                         key=jax.random.PRNGKey(2))
        step = build_train_step(cfg)
        hist = []
        for _ in range(iters):
            loop, stats, _ = step(loop)
            hist.append(stats)
        return hist

    import numpy as np

    hist = run("phase")
    d = np.array([float(h["loss/distill"]) for h in hist])
    assert np.isfinite(d).all() and (d > 0).all() and (d < 3).all()
    # the term must do SOME work (most rollout states are far-field where
    # the teacher direction is obs-uninferable, so the floor is ~ln(4) —
    # only a small drop from ln(5) is achievable globally)
    assert d[-3:].mean() < d[0], d

    ctrl = run(None, iters=1)
    assert "loss/distill" not in ctrl[0]

    # conc-gated variant averages over the near-plume subset only — a
    # different (finite) value than the global mean at the same seed
    gated = run("phase", iters=1, gate=0.05)
    g0 = float(gated[0]["loss/distill"])
    assert np.isfinite(g0) and abs(g0 - d[0]) > 1e-4


def test_ppo_update_weights_mask_no_credit():
    """The guided fine-tune's override mask (PPOBatch.weights): zero-weight
    samples must contribute NO policy-gradient credit — scrambling their
    action identities leaves the update bit-identical — while the value
    loss still sees them."""
    cfg, ts, batch = _make_state_and_batch(B=512)
    key = jax.random.PRNGKey(7)
    w = (jax.random.uniform(key, batch.actions.shape) < 0.5).astype(jnp.float32)
    masked = batch.replace(weights=w)
    scrambled = masked.replace(
        actions=jnp.where(w > 0, batch.actions,
                          (batch.actions + 2) % 5),
        old_log_probs=jnp.where(w > 0, batch.old_log_probs,
                                batch.old_log_probs - 3.21),
    )
    ts1, m1 = ppo_update(ts, masked, jax.random.PRNGKey(3), cfg)
    ts2, m2 = ppo_update(ts, scrambled, jax.random.PRNGKey(3), cfg)
    for a, b in zip(jax.tree.leaves(ts1.params), jax.tree.leaves(ts2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # weights change the result vs unweighted (the mask is live)
    ts3, _ = ppo_update(ts, batch, jax.random.PRNGKey(3), cfg)
    diff = sum(float(np.abs(np.asarray(a) - np.asarray(b)).sum())
               for a, b in zip(jax.tree.leaves(ts1.params),
                               jax.tree.leaves(ts3.params)))
    assert diff > 0.0
