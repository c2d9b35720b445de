"""Bank-match guidance (evaluation/bank_guide.py): identification accuracy,
gating behavior, and end-to-end guided success on gridded banks.

The reference's evaluators assume known-field information of exactly this
class (PPOV1.1/evaluate_model.py:25-37 gates on the episode's known peak);
here the bank row is identified in-scan from the flight's own samples.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tpu_plume.core.config import EnvConfig, EvalConfig
from tpu_plume.evaluation import evaluate_policy
from tpu_plume.evaluation.bank_guide import make_bank_guide
from tpu_plume.fields.gridded import synthesize_bank


def _raster_apply(cfg):
    """Boustrophedon surveyor (mirrors tests/test_guidance.py): sweep east,
    step south a line, sweep west — guarantees plume contact without a
    trained policy."""

    def apply_fn(params, obs):
        x = obs[..., 0] * cfg.grid_size
        y = obs[..., 1] * cfg.grid_size
        g = cfg.grid_size
        line = jnp.floor(y / 30.0)
        going_right = jnp.mod(line, 2) == 0
        at_right = x >= g - 30.0
        at_left = x <= 30.0
        turn = jnp.where(going_right, at_right, at_left)
        action = jnp.where(turn, 1, jnp.where(going_right, 3, 4))
        logits = jax.nn.one_hot(action, cfg.num_actions) * 50.0
        return logits, jnp.zeros(obs.shape[:-1])

    return apply_fn


def test_bank_guide_requires_gridded():
    import pytest

    with pytest.raises(ValueError):
        make_bank_guide(EnvConfig(), 4)


def _isotropic_bank(key, cfg, K):
    """A contact-rich bank: K wide isotropic Gaussians at random sources
    (the anisotropic synthesize_bank's ~8 px ridges give a 25 px-step
    surveyor too little contact to exercise the END-TO-END path in a
    small test; ridge identification is covered separately below)."""
    lo, hi = cfg.source_padding, cfg.grid_size - cfg.source_padding
    sources = jax.random.uniform(key, (K, 2), jnp.float32, lo, hi)
    g = cfg.grid_size
    ix = jnp.arange(g, dtype=jnp.float32)[:, None]
    iy = jnp.arange(g, dtype=jnp.float32)[None, :]

    def one(src):
        d2 = (ix - src[0]) ** 2 + (iy - src[1]) ** 2
        return cfg.conc_peak * jnp.exp(-d2 / (2.0 * cfg.plume_sigma**2))

    from tpu_plume.fields.gridded import FieldBank

    return FieldBank(conc=jax.vmap(one)(sources), source=sources)


def test_bank_guide_identifies_and_dives():
    """End-to-end on a K=16 bank of wide fields: the streaming match
    identifies the episode's row from the flight's own samples and the
    dive controller converts that into guided successes well above the
    raw surveyor."""
    cfg = EnvConfig(plume_model="gridded", max_steps=800,
                    plume_sigma=500 / 16)
    K = 16
    bank = _isotropic_bank(jax.random.PRNGKey(0), cfg, K)
    ev = EvalConfig(episodes=64, success_distance=40.0)
    apply_fn = _raster_apply(cfg)

    mg = evaluate_policy(
        {}, apply_fn, cfg, ev, jax.random.PRNGKey(1), bank=bank,
        guide=make_bank_guide(cfg, K),
    )
    mp = evaluate_policy(
        {}, apply_fn, cfg, ev, jax.random.PRNGKey(1), bank=bank,
    )
    # identification: among episodes whose gate opened, the matched row is
    # overwhelmingly the true row
    gated = mg.guide_fit_ok
    assert gated.sum() >= 24, int(gated.sum())
    correct = (mg.guide_match == mg.field_idx)[gated]
    assert correct.mean() >= 0.8, float(correct.mean())
    # guided success clears the raw surveyor by a wide margin
    assert mg.success.mean() > mp.success.mean() + 0.15, (
        float(mg.success.mean()), float(mp.success.mean()))


def test_bank_guide_on_anisotropic_ridges():
    """On the thin-ridge synthesized bank contact is scarce (the known
    loss pool), but every episode that DOES gate must have identified the
    right row — the matched source is exact, so gated dives succeed.

    Pinned to the CONSERVATIVE cadence (min_contact 4, check_every 2,
    no search/rim override): this probes the identification gate's
    soundness under a raster surveyor's sparse single-read contacts.
    The shipped defaults are the aggressive measured TPU winners
    (commit on 2 reads, rim guard + search on — RESULTS.md rim-guard
    study), which trade raster-surveyor gate accuracy for trained-policy
    success and are exercised end-to-end by the isotropic test above."""
    cfg = EnvConfig(plume_model="gridded", max_steps=800,
                    plume_sigma=500 / 16)
    K = 16
    bank = synthesize_bank(jax.random.PRNGKey(0), cfg, num_fields=K)
    ev = EvalConfig(episodes=96, success_distance=40.0)
    mg = evaluate_policy(
        {}, _raster_apply(cfg), cfg, ev, jax.random.PRNGKey(1), bank=bank,
        guide=make_bank_guide(cfg, K, min_contact=4, check_every=2,
                              search_after=None, rim_guard=False),
    )
    gated = mg.guide_fit_ok
    assert gated.sum() >= 10, int(gated.sum())
    correct = (mg.guide_match == mg.field_idx)[gated]
    assert correct.mean() >= 0.8, float(correct.mean())
    assert mg.success[gated].mean() >= 0.7, float(mg.success[gated].mean())


def test_bank_guide_margin_gate_blocks_ambiguity():
    """The score-margin gate must refuse to commit when two rows explain
    the samples equally well (duplicate fields: ratio pinned at ~1), and
    must still commit on a separable bank where the runner-up's error
    dwarfs the best's."""
    from tpu_plume.fields.gridded import FieldBank

    cfg = EnvConfig(plume_model="gridded", plume_sigma=500 / 16)
    g = cfg.grid_size
    ix = jnp.arange(g, dtype=jnp.float32)[:, None]
    iy = jnp.arange(g, dtype=jnp.float32)[None, :]

    def gauss(src):
        d2 = (ix - src[0]) ** 2 + (iy - src[1]) ** 2
        return cfg.conc_peak * jnp.exp(-d2 / (2.0 * cfg.plume_sigma**2))

    src_a = jnp.array([250.0, 250.0])
    src_b = jnp.array([100.0, 400.0])

    def run(bank, margin):
        init, step = make_bank_guide(cfg, 2, margin=margin,
                                     min_contact=2, check_every=1)
        stepj = jax.jit(lambda gs, p, c, a, b, t: step(gs, p, c, a, b, t))
        gs = init
        t = jnp.zeros((), jnp.int32)
        # walk through row 0's plume core: strong in-plume reads
        for i in range(12):
            pos = jnp.array([240.0 + i * 2.0, 250.0], jnp.float32)
            conc = gauss(src_a)[jnp.int32(pos[0]), jnp.int32(pos[1])]
            gs, _, _ = stepj(gs, pos, conc, jnp.int32(3), bank, t + i)
        return bool(gs.est_ok)

    ambiguous = FieldBank(
        conc=jnp.stack([gauss(src_a), gauss(src_a)]),
        source=jnp.stack([src_a, src_b]),
    )
    separable = FieldBank(
        conc=jnp.stack([gauss(src_a), gauss(src_b)]),
        source=jnp.stack([src_a, src_b]),
    )
    assert not run(ambiguous, margin=2.0)   # duplicate rows: never commit
    assert run(separable, margin=2.0)       # clear evidence: commit
    assert run(ambiguous, margin=1.0)       # identity-only gate would (tie
                                            # argmin is stable) — the margin
                                            # is what blocks the wrong dive


def test_bank_guide_rim_guard_deflects_then_fails_open():
    """While unidentified, a policy step that would land inside a
    candidate row's terminate ball must be deflected to a safe landing;
    after ``rim_expire`` steps the guard fails open and the policy's own
    action passes through (the measured 48% chord-dive pool must not be
    converted into hover-forever timeouts)."""
    from tpu_plume.fields.gridded import FieldBank

    cfg = EnvConfig(plume_model="gridded", plume_sigma=500 / 16)
    src = jnp.array([[250.0, 250.0]])
    bank = FieldBank(conc=jnp.zeros((1, 500, 500)), source=src)
    init, step = make_bank_guide(cfg, 1, rim_guard=True, rim_expire=64)
    stepj = jax.jit(lambda gs, p, c, a, b, t: step(gs, p, c, a, b, t))

    # 60 px east of the source, policy pushes west (action 4, -x):
    # landing at 35 px is inside the 50 px terminate ball
    pos = jnp.array([310.0, 250.0], jnp.float32)
    t = jnp.zeros((), jnp.int32)
    gs = init
    gs, action, on = stepj(gs, pos, jnp.float32(0.0), jnp.int32(4), bank, t)
    assert not bool(on)
    assert int(action) != 4
    m = cfg.move_step
    deltas = np.array([[0, 0], [0, m], [0, -m], [m, 0], [-m, 0]], np.float32)
    landing = np.asarray(pos) + deltas[int(action)]
    assert np.linalg.norm(landing - np.asarray(src[0])) > 50.0

    # drive the step counter past rim_expire: the guard must fail open
    for _ in range(70):
        gs, action, on = stepj(gs, pos, jnp.float32(0.0), jnp.int32(4),
                               bank, t)
    assert int(action) == 4


def test_bank_guide_background_steps_do_not_accumulate():
    """Steps where the observation is background AND every row predicts
    background must not move the score: the common noise floor otherwise
    drowns sporadic contact reads (measured: score ratio pinned at 1.000
    across 1000-step flights)."""
    from tpu_plume.fields.gridded import FieldBank

    cfg = EnvConfig(plume_model="gridded", plume_sigma=500 / 16)
    bank = FieldBank(conc=jnp.zeros((2, 500, 500)),
                     source=jnp.array([[100.0, 100.0], [400.0, 400.0]]))
    init, step = make_bank_guide(cfg, 2)
    stepj = jax.jit(lambda gs, p, c, a, b, t: step(gs, p, c, a, b, t))
    gs = init
    t = jnp.zeros((), jnp.int32)
    # weak noise reads over an all-background bank: nothing informative
    for i in range(16):
        gs, _, _ = stepj(gs, jnp.array([250.0, 250.0], jnp.float32),
                         jnp.float32(0.3), jnp.int32(3), bank, t + i)
    assert float(jnp.abs(gs.score).max()) == 0.0


def test_bank_guide_gate_needs_contact():
    """Without in-plume samples every row scores identical noise — the
    identification gate must stay shut (min_contact)."""
    cfg = EnvConfig(plume_model="gridded", plume_sigma=500 / 16)
    K = 4
    bank = synthesize_bank(jax.random.PRNGKey(0), cfg, num_fields=K)
    init, step = make_bank_guide(cfg, K)

    gs = init
    pos = jnp.array([5.0, 5.0], jnp.float32)  # far corner: no contact
    t = jnp.zeros((), jnp.int32)
    stepj = jax.jit(lambda g, p, c, a, b, t: step(g, p, c, a, b, t))
    for i in range(32):
        gs, action, on = stepj(gs, pos, jnp.float32(0.0), jnp.int32(3),
                               bank, t + i)
    assert not bool(gs.est_ok)
    assert int(action) == 3  # policy action passes through


def test_bank_guide_guard_top_restricts_to_scored_candidates():
    """``guard_top``: pre-contact the guard stands down (every row ties,
    and guarding a K-sized ball set tiles the domain — the measured K=64
    thrash); once contact evidence exists, only the top-scored rows'
    balls deflect, and a ball far down the ranking does not."""
    from tpu_plume.fields.gridded import FieldBank

    cfg = EnvConfig(plume_model="gridded", plume_sigma=500 / 16)
    g = cfg.grid_size
    ix = jnp.arange(g, dtype=jnp.float32)[:, None]
    iy = jnp.arange(g, dtype=jnp.float32)[None, :]

    def gauss(src, sig=60.0):
        d2 = (ix - src[0]) ** 2 + (iy - src[1]) ** 2
        return jnp.exp(-d2 / (2.0 * sig * sig))

    # row 0: plume the flight is standing in (will be top-scored);
    # rows 1..3: distant decoys, one of them near the flight's west path
    srcs = jnp.array([[250.0, 250.0], [100.0, 400.0],
                      [400.0, 100.0], [130.0, 250.0]])
    bank = FieldBank(conc=jnp.stack([gauss(s) for s in srcs]), source=srcs)
    init, step = make_bank_guide(
        cfg, 4, rim_guard=True, rim_expire=1000, guard_top=1,
        min_contact=99,  # keep the gate shut: this tests the guard only
    )
    stepj = jax.jit(lambda gs, p, c, a, b, t: step(gs, p, c, a, b, t))
    t = jnp.zeros((), jnp.int32)

    # PRE-CONTACT: 60 px east of row 0's source, policy pushes west into
    # its ball — with guard_top the guard is inactive, action passes
    gs = init
    pos = jnp.array([310.0, 250.0], jnp.float32)
    gs, action, _ = stepj(gs, pos, jnp.float32(0.0), jnp.int32(4), bank, t)
    assert int(action) == 4

    # CONTACT at row 0's core: row 0 becomes the (sole) guarded ball
    conc = float(bank.conc[0, 310, 250]) * cfg.conc_peak + 0.5
    gs, _, _ = stepj(gs, pos, jnp.float32(conc), jnp.int32(0), bank, t)
    assert int(gs.n_contact) >= 1 and int(gs.match) == 0
    gs, action, _ = stepj(gs, pos, jnp.float32(0.0), jnp.int32(4), bank, t)
    assert int(action) != 4  # row 0's ball now deflects

    # a step toward the UNranked decoy at [130, 250] passes untouched:
    # stand 60 px east of it and push west (lands 35 px from the decoy)
    pos2 = jnp.array([190.0, 250.0], jnp.float32)
    gs, action, _ = stepj(gs, pos2, jnp.float32(0.0), jnp.int32(4), bank, t)
    assert int(action) == 4


def test_bank_guide_entry_dive_rule():
    """``entry_dive=True``: the local entry rule forbids only the
    shallow-chord band ((deep_take, avoid_r] of a live ball), lets deep
    entries pass, converts kill moves into deep dives when one is
    available, and never fails open (chords are 0%-win moves)."""
    from tpu_plume.fields.gridded import FieldBank

    cfg = EnvConfig(plume_model="gridded", plume_sigma=500 / 16)
    src = jnp.array([[250.0, 250.0]])
    bank = FieldBank(conc=jnp.zeros((1, 500, 500)), source=src)
    init, step = make_bank_guide(cfg, 1, rim_guard=True, rim_expire=64,
                                 entry_dive=True)
    stepj = jax.jit(lambda gs, p, c, a, b, t: step(gs, p, c, a, b, t))
    t = jnp.zeros((), jnp.int32)
    m = cfg.move_step
    deltas = np.array([[0, 0], [0, m], [0, -m], [m, 0], [-m, 0]],
                      np.float32)

    # DEEP entry passes: 60 px east, west lands at 35 = deep_take —
    # success-quality if the ball is true (the rim guard deflected this)
    gs = init
    pos = jnp.array([310.0, 250.0], jnp.float32)
    gs, action, on = stepj(gs, pos, jnp.float32(0.0), jnp.int32(4), bank, t)
    assert not bool(on)
    assert int(action) == 4

    # KILL chord substituted, and NOT failed open after rim_expire:
    # 70 px east, west lands at 45 — the guaranteed-loss band
    gs = init
    pos = jnp.array([320.0, 250.0], jnp.float32)
    for _ in range(70):
        gs, action, _ = stepj(gs, pos, jnp.float32(0.0), jnp.int32(4),
                              bank, t)
        assert int(action) != 4
        landing = np.asarray(pos) + deltas[int(action)]
        d = np.linalg.norm(landing - np.asarray(src[0]))
        assert d <= 35.0 or d > 50.0

    # CHORD-TO-DIVE conversion: hovering in the (50, 55] shell is
    # itself a kill (drift can cross the rim), and the preferred
    # substitute is the available deep entry west (52 - 25 = 27 px)
    gs = init
    pos = jnp.array([302.0, 250.0], jnp.float32)
    gs, action, _ = stepj(gs, pos, jnp.float32(0.0), jnp.int32(0), bank, t)
    assert int(action) == 4

    # a ball the drone is already INSIDE is dead (it did not terminate,
    # so it is not the true row): moves near its center pass untouched
    gs = init
    pos = jnp.array([260.0, 250.0], jnp.float32)
    gs, action, _ = stepj(gs, pos, jnp.float32(0.0), jnp.int32(4), bank, t)
    assert int(action) == 4


def test_bank_guide_margin_deadline_fallback():
    """``margin_until``: the margin requirement expires at the deadline —
    an ambiguous bank (margin never satisfiable) still commits once the
    flight passes the deadline with identity-stable evidence, and stays
    blocked while the deadline is ahead (round-5 LES evidence A/B: the
    hard margin's gate starvation, 88 -> 55%, is the cost this caps)."""
    from tpu_plume.fields.gridded import FieldBank

    cfg = EnvConfig(plume_model="gridded", plume_sigma=500 / 16)
    g = cfg.grid_size
    ix = jnp.arange(g, dtype=jnp.float32)[:, None]
    iy = jnp.arange(g, dtype=jnp.float32)[None, :]

    def gauss(src):
        d2 = (ix - src[0]) ** 2 + (iy - src[1]) ** 2
        return cfg.conc_peak * jnp.exp(-d2 / (2.0 * cfg.plume_sigma**2))

    src_a = jnp.array([250.0, 250.0])
    src_b = jnp.array([100.0, 400.0])
    ambiguous = FieldBank(
        conc=jnp.stack([gauss(src_a), gauss(src_a)]),
        source=jnp.stack([src_a, src_b]),
    )

    def run(margin_until):
        init, step = make_bank_guide(cfg, 2, margin=2.0,
                                     margin_until=margin_until,
                                     min_contact=2, check_every=1)
        stepj = jax.jit(lambda gs, p, c, a, b, t: step(gs, p, c, a, b, t))
        gs = init
        t = jnp.zeros((), jnp.int32)
        for i in range(12):
            pos = jnp.array([240.0 + i * 2.0, 250.0], jnp.float32)
            conc = gauss(src_a)[jnp.int32(pos[0]), jnp.int32(pos[1])]
            gs, _, _ = stepj(gs, pos, conc, jnp.int32(3), ambiguous, t + i)
        return bool(gs.est_ok)

    assert not run(0)     # margin always on: duplicate rows never commit
    assert not run(100)   # deadline ahead: still blocked
    assert run(6)         # deadline passed mid-walk: identity gate commits
