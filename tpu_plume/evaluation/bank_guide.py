"""Bank-match terminal guidance for gridded fields (round-3 VERDICT #2).

At eval time the ``FieldBank`` — every candidate mean field AND its per-row
source position (fields/gridded.py:34-66) — sits in HBM.  An episode's
field is one of those K rows, so source localization reduces to a
K-way IDENTIFICATION problem: which row best explains the flight's own
(position, concentration) samples?  For modest K that is near-exact long
before a regression localizer converges — the learned localizer plateaus
at 19-31 px median error and 31.7-33.8% guided s@40 on gridded banks
(RESULTS.md learned-guide rows), while a correct match inherits the
EXACT source.

The reference's own evaluators assume exactly this class of field
knowledge — PPOV1.1/evaluate_model.py:25-37 gates its stop decision on
the episode's known peak concentration.

TPU-native mechanics (fixed shapes, no data-dependent control flow, and
the bank rides as a jit ARGUMENT — a closed-over bank would become a
compile-request constant, the HTTP-413 trap in CLAUDE.md):

  - STREAMING score: each step gathers all K rows' predictions at the
    agent's current cell (one [K]-vector gather; time/height interpolated
    for 4-D/5-D banks via ``sample_bank``) and accumulates per-row squared
    error against the debiased observation.  No ring buffer: the match
    uses the ENTIRE flight, O(K) state per env.  Only INFORMATIVE steps
    accumulate — the observation is in-plume, or at least one row
    predicts in-plume at this cell (absence evidence).  Background steps
    where every row predicts background add the SAME noise variance to
    every row: traced episodes showed hundreds of such steps drowning
    the sporadic ridge-crossing reads, pinning the runner-up/best score
    ratio at 1.000 for the whole flight and deadlocking any
    margin-based gate.
  - noise handling: the additive turbulence mean (TI*(sqrt(2/pi)+0.1),
    same constant as guidance.py's inversion debias) is subtracted from
    the observation; its variance is row-independent so the argmin is the
    maximum-likelihood row under the env's noise model.
  - gate: the argmin row must be STABLE across two consecutive checks
    (``check_every`` apart) after at least ``min_contact`` in-plume
    samples (>= 3 sigma of turbulence noise above the debiased floor) —
    without contact every row scores identical noise and the argmin is
    meaningless.  Identity stability replaces magnitude thresholds, so
    nothing here needs per-family tuning.  Defaults are aggressive
    (min_contact 2, check_every 1) because contact is the scarce
    resource on anisotropic ridges (~8 px wide vs 25 px moves — a
    surveyor reads a ridge ~1 cell in 3 line crossings) while the score
    separates in just a few in-plume samples: each contact read c adds
    ~c^2 to every row predicting background there (measured margin at 8
    contacts: 20x between the true row and the runner-up); under the
    default score-margin gate the early commit costs no accuracy
    (1000-ep TPU rows: 86.6% match accuracy at gate rate 95%).
  - optional SCORE-MARGIN gate (``margin`` > 1): additionally require
    the runner-up row's accumulated error to exceed the best row's by a
    ratio before committing.  Scale-free: under pure noise every row
    accumulates the same variance so the ratio sits at ~1 and the gate
    stays shut; each in-plume read a wrong row cannot explain adds ~c^2
    to its score only, so the ratio grows with real evidence.  This
    trades gate latency for identification accuracy — aggressive
    cadences (min_contact 2, check_every 1) commit on two reads and
    mis-identify ~17-25% of gated episodes; a margin recovers the
    accuracy without waiting for more contact when the evidence is
    already unambiguous.  ``margin_until`` bounds the latency cost with
    a DEADLINE: after that flight step the gate reverts to identity
    stability only, so evidence-starved flights still dive instead of
    never (round-5 LES study: a hard margin fixed identification,
    97-98.5% when gated, but starved the gate 88 -> 55%; margin 1.5
    with deadline 400 — the CLI default — keeps baseline gate rates
    and lifts every measured band, RESULTS.md deadline-margin section).
  - once gated, ``guidance.phase_action`` drives the dive at the matched
    row's KNOWN source — same crossing geometry as the trilateration and
    learned guides.
  - SEARCH fallback (``search_after`` >= 0, default 50; None disables):
    a flight with ZERO
    in-plume samples after that many steps is steered on a serpentine
    survey (the non-privileged boustrophedon of evaluation/oracle.py's
    ``raster``, extended with an edge flip so it covers the domain from
    any start row) until contact, RESUMING whenever contact dries up
    for another ``search_after`` steps (a single noise spike must not
    end the survey).  Sweep steps that would land inside any candidate
    row's terminate ball are detoured (the raster oracle's documented
    chord problem: a blind sweep crossing the TRUE ball ends the episode
    on a shallow chord); under the rim guard the sweep honors the same
    fail-open budget.
  - RIM GUARD (``rim_guard=True``, the default): while the identification
    gate is CLOSED, any policy step that would land inside the
    noise-margined terminate ball of ANY candidate row is deflected
    TANGENTIALLY around the nearest ball (bug-algorithm wall following —
    farthest-landing substitution measured ping-ponging in place).  Per-episode accounting showed the
    dominant loss is NOT missing contact but the policy CROSSING the
    ball early: ungated episodes end in ~23 steps with failure
    deviations 42-49 (shallow chords, just outside success radius 40) —
    one third of all episodes.  The guard holds the drone at the rim —
    in plume core, where two reads open the gate — and the phase dive
    then lands deep.  This is the bank-flavored fix the iso fit guide's
    hover-veto could NOT deliver (its ~22 px estimate error cannot
    police a 25 px margin, RESULTS.md engagement negatives); here the
    candidate ball centers are EXACT.  ``guard_top`` > 0 restricts the
    guard (and the sweep's detours) to the top-scored rows' balls once
    contact exists, standing down pre-contact — the K=64 fix: 64 avoid
    balls tile the domain, so guarding all of them deflects constantly
    and the gate opens on weaker evidence (accuracy 95.8% -> 57.3%).
  - ACTIVE DISAMBIGUATION (automatic with the rim guard): reads taken
    while bouncing at one rim spot cannot separate rows whose fields
    agree locally — measured: rim guard + margin alone deadlocks (gate
    rate 23%, 73% timeouts, the drone parked where the top-2 rows
    predict the same values).  Once contact is established but the gate
    is still shut, the guide steers toward the cell where the TOP-2
    rows' fields disagree most (argmax of |field_a - field_b| on a
    stride-8 subsample for static banks; greedy 1-step disagreement for
    time/height-varying banks), ball-safe.  That point is typically a
    disputed source region — one row predicts near-peak, the other
    background — so a handful of reads there resolves the identity and
    the margin gate opens.  This is a 1-step active-identification
    controller: the information to choose the most informative
    measurement is all in the bank.

Diagnostics: the state carries the matched row so the harness can report
a confusion rate against the episode's true ``field.idx``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from tpu_plume.core.config import EnvConfig
from tpu_plume.evaluation.guidance import _NOISE_STD_FRAC, phase_action


@struct.dataclass
class BankGuideState:
    score: jnp.ndarray       # f32[K] accumulated squared prediction error
    n_contact: jnp.ndarray   # i32 in-plume samples ingested
    count: jnp.ndarray       # i32 steps ingested
    match: jnp.ndarray       # i32 current best row (argmin score)
    match_prev: jnp.ndarray  # i32 best row at the previous check
    est_ok: jnp.ndarray      # bool: identification gate open
    est: jnp.ndarray         # f32[2] matched row's source (diagnostics)
    mode: jnp.ndarray        # i32 1 while overriding (diagnostics parity)
    sweep_down: jnp.ndarray  # bool: serpentine vertical direction (search)
    last_contact: jnp.ndarray  # i32 step of the most recent in-plume read
    target: jnp.ndarray      # i32 seated dive row (sticky_target mode)


def make_bank_guide(
    cfg: EnvConfig,
    num_rows: int,
    *,
    check_every: int = 1,
    min_contact: int = 2,
    margin: float = 1.0,
    margin_until: int = 0,
    search_after: int | None = 50,
    rim_guard: bool = True,
    rim_expire: int = 400,
    guard_top: int = 0,
    entry_dive: bool = False,
    dive_bias: bool = False,
    sticky_target: bool = False,
    reseat_margin: float = 1.3,
    terminate_radius: float = 50.0,
    success_radius: float = 40.0,
):
    """(init_state, step_fn) for ``evaluate_policy``'s guide hook.

    ``num_rows``: K, the bank's leading dimension (static — the bank
    itself arrives per call as a traced argument; see module docstring).
    The step is marked ``needs_bank``: the harness calls it as
    ``step(gs, pos, conc, policy_action, bank, t)``.
    """
    if cfg.plume_model != "gridded":
        raise ValueError("--guide bank requires plume_model='gridded'")
    deep_target = min(success_radius - 10.0, 0.8 * terminate_radius)
    # setup ring pushed out by the same +4 px margin the aniso guide
    # measured on thin ridges, with the acceptance bound (deep_take)
    # opened so a ring crossing still qualifies: hovering 4 px off the
    # ball with ~7 px/step turbulence displacement was the residual
    # accident pool (33% of correctly-identified dives entering at
    # deviation 47-50)
    # round-5 precision-protocol note: at terminate_radius 5 the old
    # 0.9*r bound (4.5) made the controller WAIT for a sub-4.5-px landing
    # with 10-px quantized moves — flights averaged 405 endgame-heavy
    # steps and ~15% burned the budget.  Accepting ANY in-ball landing
    # (bound = r) is identical at the r50 protocol (min() unchanged) and
    # only widens the take window where the ball is tiny.
    deep_take = min(success_radius - 5.0, float(terminate_radius))
    setup_distance = cfg.grid_size * cfg.move_frac + min(
        deep_target + 3.0, deep_take - 1.0)
    noise_mean = cfg.turbulence_intensity * (0.7978845608 + 0.1)
    # in-plume = 3 sigma of debiased turbulence noise above zero
    contact_floor = 3.0 * _NOISE_STD_FRAC * cfg.turbulence_intensity
    rows = jnp.arange(num_rows, dtype=jnp.int32)
    g = float(cfg.grid_size)
    m = float(cfg.move_step)
    band_h = 1.12 * float(cfg.plume_sigma)
    # ball-avoidance margin, derived from the env's turbulence
    # DISPLACEMENT scale (step_noise: move_step * coef * N(0,1) * tke
    # fraction, so sigma <= move_step * coef per axis): standing 0.1
    # moves off the rim measured a ~35% accidental-entry pool among
    # correctly-identified episodes — every failure at deviation 47-50,
    # i.e. first-entry terminations while guarded or setting up
    avoid_r = terminate_radius + 2.5 * m * float(cfg.turb_displacement_coef)

    def init() -> BankGuideState:
        zi = jnp.zeros((), jnp.int32)
        return BankGuideState(
            score=jnp.zeros((num_rows,), jnp.float32),
            n_contact=zi, count=zi,
            match=zi, match_prev=jnp.full((), -1, jnp.int32),
            est_ok=jnp.zeros((), bool),
            est=jnp.zeros((2,), jnp.float32),
            mode=zi,
            sweep_down=jnp.zeros((), bool),
            last_contact=zi,
            target=jnp.full((), -1, jnp.int32),
        )

    def step(gs: BankGuideState, pos, conc, policy_action, bank, t):
        from tpu_plume.fields.gridded import sample_bank

        ij = jnp.clip(jnp.floor(pos[:2]).astype(jnp.int32),
                      0, cfg.grid_size - 1)
        preds = sample_bank(
            bank, rows, ij[0], ij[1], t=jnp.broadcast_to(t, (num_rows,)),
            z=(jnp.broadcast_to(pos[2], (num_rows,)) if cfg.env_3d else None),
        ) / cfg.conc_peak
        obs = jnp.maximum(conc - noise_mean, 0.0) / cfg.conc_peak
        floor_n = contact_floor / cfg.conc_peak
        informative = (obs >= floor_n) | (jnp.max(preds) >= floor_n)
        score = gs.score + informative * (obs - preds) ** 2
        contact_now = conc - noise_mean >= contact_floor
        n_contact = gs.n_contact + contact_now.astype(jnp.int32)
        count = gs.count + 1
        last_contact = jnp.where(contact_now, count, gs.last_contact)

        match = jnp.argmin(score).astype(jnp.int32)
        do_check = (count % check_every == 0) & (n_contact >= min_contact)
        stable = match == gs.match_prev
        if num_rows >= 2:
            neg2, top2 = jax.lax.top_k(-score, 2)
        else:  # degenerate single-row bank: no runner-up exists
            neg2 = jnp.stack([-score[0], -score[0]])
            top2 = jnp.zeros((2,), jnp.int32)
        if margin > 1.0:
            # top-2 smallest scores: commit only when the runner-up's
            # accumulated error exceeds the best's by the margin ratio
            margin_ok = -neg2[1] > margin * -neg2[0]
            if margin_until > 0:
                # DEADLINE fallback (round-5, from the LES evidence A/B):
                # a hard margin fixes identification (97-98.5% when
                # gated) but starves the gate (88 -> 55% on LES);
                # requiring the margin only before ``margin_until``
                # keeps the high-accuracy early commits and reverts to
                # identity-stability gating for evidence-starved flights
                margin_ok = margin_ok | (count >= margin_until)
            stable = stable & margin_ok
        # STICKY once open: momentary argmin flips mid-dive otherwise
        # hand control back to the rim guard for a step (measured control
        # thrash at the rim); the dive target below follows the LATEST
        # argmin either way, so a wrong commit still self-corrects.
        est_ok = gs.est_ok | (do_check & stable)
        match_prev = jnp.where(do_check, match, gs.match_prev)
        if sticky_target:
            # STICKY DIVE TARGET (round-5, from the K=64 accounting):
            # following the LATEST argmin mid-dive lets momentary score
            # flips re-route the dive — at K=64 the re-route transits
            # shallowly past the true ball and terminates at dev ~49.5
            # (right_match_fail: 86/1000 episodes at 275 mean steps).
            # Seat the target when the gate opens; reseat ONLY when the
            # new argmin beats the seated row's accumulated error by
            # ``reseat_margin`` (real evidence, not churn).
            seated = jnp.where(gs.target >= 0, gs.target, match)
            better = score[seated] > reseat_margin * score[match]
            target = jnp.where(est_ok & ~better, seated, match)
            dive_row = target
        else:
            # steer at the latest argmin (not the checkpointed one):
            # between checks the argmin only moves if new evidence
            # overturns it, and the freshest identification is the best
            # dive target
            target = gs.target
            dive_row = match
        src = bank.source[dive_row]

        g_action = phase_action(
            pos[:2], src, cfg, terminate_radius, deep_target,
            setup_distance, deep_take=deep_take,
        )
        if 0 < guard_top < num_rows:
            # guard only the top-``guard_top`` candidate rows by score,
            # and only once contact evidence exists.  At K=64 guarding
            # ALL rows tiles the domain with ~55 px avoid balls —
            # measured: constant deflection, the disambiguation target
            # churns, and the gate opens on weaker evidence (match
            # accuracy 95.8% -> 57.3%, RESULTS.md rim-guard study).
            # Post-contact the score separates in 2-3 reads, so the
            # true row is in the top few with overwhelming probability;
            # pre-contact every row ties and guarding an arbitrary
            # subset is noise, so the guard stands down.
            _, top_g = jax.lax.top_k(-score, guard_top)
            guard_centers = bank.source[top_g, :2]               # [M, 2]
            guard_active = n_contact >= 1
        else:
            guard_centers = bank.source[:, :2]
            guard_active = jnp.ones((), bool)

        def _safe_move(a):
            # refuse any landing within the terminate radius of ANY
            # guarded candidate row.  When ``a`` is blocked, substitute
            # the safe
            # move with the most CLOCKWISE-TANGENTIAL progress around the
            # nearest ball (bug-algorithm wall following) — substituting
            # the farthest-from-ball landing instead was traced
            # ping-ponging between two cells for hundreds of steps
            # (blocked move -> step away -> step right back), so the
            # drone never ROUTED AROUND an intervening ball.  All-unsafe
            # corner: the farthest landing wins (entering a WRONG
            # candidate's ball costs nothing — only the true row's ball
            # terminates).
            deltas = jnp.array([[0.0, 0.0], [0.0, m], [0.0, -m],
                                [m, 0.0], [-m, 0.0]], jnp.float32)
            land = pos[None, :2] + deltas                        # [5, 2]
            d_all = jnp.linalg.norm(
                land[:, None, :] - guard_centers[None, :, :], axis=-1,
            )                                                    # [5, M]
            d_min = jnp.min(d_all, axis=-1)                      # [5]
            near = jnp.argmin(d_all[0])
            u = pos[:2] - guard_centers[near]
            tangent = jnp.array([u[1], -u[0]])                   # clockwise
            t_score = deltas[1:] @ tangent / (
                jnp.linalg.norm(tangent) + 1e-6) / m             # [4] in [-1,1]
            safe = d_min[1:] > avoid_r
            moves = jnp.arange(1, 5, dtype=jnp.int32)            # 1..4
            pref = jnp.where(safe, t_score + 1e-4 * d_min[1:],
                             -1e3 + 1e-3 * d_min[1:])
            sub = moves[jnp.argmax(pref)]
            a_ok = (d_min[a] > avoid_r) | (a == 0) | ~guard_active
            return jnp.where(a_ok, a, sub).astype(jnp.int32)

        def _entry_rule(a):
            # ENTRY-DIVE rule (``entry_dive=True``): local, stateless
            # ball handling for banks whose terminate balls TILE the
            # domain (K=64: 64 x pi*50^2 = 2x the 500^2 area, so the
            # full rim guard deflects constantly while ``guard_top``'s
            # pre-contact stand-down re-opens the chord lottery —
            # RESULTS.md K=64 rows).  Only the single ball a move could
            # actually enter is ever constrained:
            #   - LIVE ball: center farther than ``terminate_radius``
            #     from the CURRENT position (standing inside a ball
            #     that did not terminate already proves it wrong);
            #   - KILL landing: within (deep_take, avoid_r] of any
            #     live ball — the shallow chord that lands at
            #     deviation 42-49 if that ball is true, the measured
            #     one-third loss pool — forbidden, no expiry (chords
            #     were 0%-win moves; unlike the rim guard there is no
            #     lottery upside to fail open to);
            #   - DEEP landing: <= deep_take of a live ball and not a
            #     kill — success-quality if the ball is true, free if
            #     wrong — allowed through, and PREFERRED as the
            #     substitute for a killed move (chord-to-dive
            #     conversion: with 25 px moves any approach aligns
            #     with an axis within a few tangent steps, so every
            #     true-ball encounter becomes a deep landing instead
            #     of a coin flip);
            #   - otherwise tangential around the nearest live ball,
            #     same bug-style wall following as ``_safe_move``.
            # ONLY the single nearest live ball constrains the step.
            # Testing landings against every ball's shell measured
            # paralysis at K=64: the (deep_take, avoid_r] bands jointly
            # cover ~1.4x the domain, so nearly every inward move was
            # "kill" w.r.t. SOME ball and flights thrashed to timeout
            # (32-ep smoke: 9% success, mean 909 steps).  Per-step risk
            # is ~1/K per foreign ball; the ball actually being
            # APPROACHED — the nearest — carries the measured chord
            # pool, and single-ball tests can never wall off the domain.
            deltas = jnp.array([[0.0, 0.0], [0.0, m], [0.0, -m],
                                [m, 0.0], [-m, 0.0]], jnp.float32)
            land = pos[None, :2] + deltas                    # [5, 2]
            centers = bank.source[:, :2]                     # [K, 2]
            big = jnp.float32(1e9)
            d0 = jnp.linalg.norm(pos[None, :2] - centers, axis=-1)
            live = d0 > terminate_radius                     # [K]
            near = jnp.argmin(jnp.where(live, d0, big))
            c = centers[near]
            dn = jnp.linalg.norm(land - c[None, :], axis=-1)  # [5]
            kill = live[near] & (dn > deep_take) & (dn <= avoid_r)
            # substitute: one step of the SHARED dive controller at the
            # threatened ball.  A tangential substitute measured as an
            # outward ratchet (each tangent landing sits at
            # sqrt(r^2 + m^2) > r, so blocked flights orbited at 55-70 px
            # forever: 32-ep smoke mean 548 steps, 41% success);
            # phase_action instead walks the ring to axis alignment and
            # takes only landings <= deep_take — the controller keeps
            # pushing inward exactly while its own moves stay blocked,
            # so the dive completes, and if the ball was wrong it goes
            # dead on entry (non-termination) and control falls back.
            sub = phase_action(
                pos[:2], c, cfg, terminate_radius, deep_target,
                setup_distance, deep_take=deep_take,
            ).astype(jnp.int32)
            return jnp.where(kill[a], sub, a).astype(jnp.int32)

        move_filter = _entry_rule if entry_dive else _safe_move

        fallback = policy_action.astype(jnp.int32)
        sweep_down = gs.sweep_down
        if search_after is not None:
            # serpentine survey until FIRST contact: horizontal direction
            # from the band's parity, vertical direction flipped at the
            # y edges so the sweep covers the domain from any start row
            x, y = pos[0], pos[1]
            at_top = y >= g - 1.2 * m
            at_bot = y <= 1.2 * m
            sweep_down = jnp.where(at_top, True,
                                   jnp.where(at_bot, False, sweep_down))
            band = jnp.floor(y / band_h).astype(jnp.int32)
            going_right = band % 2 == 0
            turn = jnp.where(going_right, x >= g - 1.2 * m, x <= 1.2 * m)
            vert = jnp.where(sweep_down, 2, 1)
            s_action = move_filter(jnp.where(
                turn, vert, jnp.where(going_right, 3, 4)
            ).astype(jnp.int32))
            # RESUME when contact dries up: a single noise spike over the
            # contact floor must not disable the survey for the rest of
            # the flight (traced: one tail read at step 60 left a
            # never-contacted episode wandering for 900 steps).  Under the
            # rim guard the search honors the same fail-open budget: a
            # ball-safe sweep that never identifies must hand control
            # back too, or it blocks the policy's chord dives forever
            # (measured: never-contact pool 48% -> 11% success, 78%
            # timeouts, when the sweep outlived the guard).
            searching = (~est_ok) & (
                count - last_contact >= search_after)
            if rim_guard and not entry_dive:
                # under the rim guard the sweep honors the fail-open
                # budget (see above); under the entry rule the sweep's
                # own ball entries BECOME dives, so it never blocks the
                # chord-win pool and needs no expiry
                searching = searching & (count < rim_expire)
            fallback = jnp.where(searching, s_action, fallback)
        if rim_guard:
            # active disambiguation: with contact established but the
            # gate shut, head for the cell where the top-2 rows disagree
            # most (see module docstring)
            if bank.conc.ndim == 3:
                sub = bank.conc[top2][:, ::8, ::8]        # [2, h', w']
                diff = jnp.abs(sub[0] - sub[1])
                flat = jnp.argmax(diff)
                w_ = sub.shape[2]
                tgt = jnp.stack([
                    (flat // w_).astype(jnp.float32) * 8.0 + 4.0,
                    (flat % w_).astype(jnp.float32) * 8.0 + 4.0,
                ])
            else:
                # greedy 1-step: probe the 4 landings' predicted
                # disagreement (2 rows x 4 points, one broadcast gather)
                mv = jnp.array([[0.0, m], [0.0, -m],
                                [m, 0.0], [-m, 0.0]], jnp.float32)
                lp = jnp.clip(jnp.floor(pos[None, :2] + mv), 0,
                              cfg.grid_size - 1).astype(jnp.int32)
                pr = sample_bank(
                    bank, top2[:, None], lp[None, :, 0], lp[None, :, 1],
                    t=jnp.broadcast_to(t, (2, 4)),
                    z=(jnp.broadcast_to(pos[2], (2, 4))
                       if cfg.env_3d else None),
                )                                          # [2, 4]
                best = jnp.argmax(jnp.abs(pr[0] - pr[1]))
                tgt = pos[:2] + mv[best]
            to = tgt - pos[:2]
            disc = jnp.where(
                jnp.abs(to[0]) >= jnp.abs(to[1]),
                jnp.where(to[0] > 0, 3, 4),
                jnp.where(to[1] > 0, 1, 2),
            ).astype(jnp.int32)
            # FAIL OPEN after ``rim_expire`` steps: episodes whose
            # identification never converges must hand control back —
            # the raw policy's own chord dives land inside the success
            # radius ~48% of the time (measured), and a permanent guard
            # converts those wins into hover-forever timeouts
            guard_on = count < rim_expire
            # only with real evidence: a strictly separated top-2 (noise
            # spikes leave every row tied, and steering at the tied pair's
            # disagreement point would override the serpentine survey)
            have_evidence = -neg2[1] > -neg2[0]
            discriminating = ((~est_ok) & (n_contact >= min_contact)
                              & guard_on & have_evidence)
            fallback = jnp.where(discriminating, disc, fallback)
            if not entry_dive:
                # while unidentified, the policy must not cross any
                # candidate ball: deflect rim-bound steps (module
                # docstring)
                fallback = jnp.where(
                    guard_on, _safe_move(fallback), fallback)
        if entry_dive:
            # the entry rule replaces the rim guard's blanket deflection
            # for EVERY ungated step (policy, sweep, and disambiguation
            # moves alike) with no expiry — it forbids only
            # guaranteed-loss shallow chords and lets deep entries pass
            fallback = _entry_rule(fallback)
        if dive_bias:
            # DIVE-BIAS substitution (round-5, from the K=64 per-episode
            # accounting, scripts/g64_accounting.py): 58% of guard_top
            # failures are BLIND chord deaths — zero-contact flights that
            # cross the true ball at mean step 32 and terminate at mean
            # deviation 45.2, just outside the 40-px success radius —
            # because guard_top stands down pre-contact and nothing
            # polices the chord geometry.  Both prior fixes overreached:
            # the full rim guard BLOCKS entries (64 balls tile the domain
            # — constant deflection), the entry-dive rule ADDS dives
            # (phase-controller substitution burned the step budget at
            # wrong balls, 412 mean steps, 45.9%).  This rule does
            # neither: ONLY when the already-chosen ungated move crosses
            # into the nearest live ball does it substitute the
            # DEEPEST-LANDING of the five moves at that ball.  It never
            # blocks (no tiling paralysis), never initiates an entry
            # (no budget waste at wrong balls — a wrong ball's deep
            # landing costs exactly what its chord landing did: nothing),
            # and substitutes only for the one landing that was about to
            # happen.  Geometry (move 25, ball 50): a deep landing
            # (<= deep_take) exists only from d <= ~60, but chords are
            # entered from anywhere in (50, 75].  STRIKE deepest when a
            # <= deep_take landing exists; otherwise leave the policy's
            # chord UNTOUCHED — a hold-at-the-closest-non-entering-
            # landing variant was measured (256-ep CPU): it stalls
            # flights at wrong-ball rims (mean steps 137 -> 441, new
            # timeout buckets, match accuracy 83.6% -> 61%) and destroys
            # the ungated chord-lottery wins (20.4% -> 13.7% of
            # episodes), netting 49.2% s@40 vs the 56.8% baseline.  Far
            # entries stay a lottery; only the winnable near entries are
            # converted.
            deltas = jnp.array([[0.0, 0.0], [0.0, m], [0.0, -m],
                                [m, 0.0], [-m, 0.0]], jnp.float32)
            land = pos[None, :2] + deltas                    # [5, 2]
            centers = bank.source[:, :2]                     # [K, 2]
            big = jnp.float32(1e9)
            d0b = jnp.linalg.norm(pos[None, :2] - centers, axis=-1)
            liveb = d0b > terminate_radius                   # [K]
            nearb = jnp.argmin(jnp.where(liveb, d0b, big))
            dnb = jnp.linalg.norm(
                land - centers[nearb][None, :], axis=-1)     # [5]
            entering = liveb[nearb] & (dnb[fallback] <= terminate_radius)
            strike = jnp.argmin(dnb).astype(jnp.int32)
            do_strike = entering & (jnp.min(dnb) <= deep_take)
            fallback = jnp.where(do_strike, strike, fallback).astype(
                policy_action.dtype)
        fallback = fallback.astype(policy_action.dtype)
        action = jnp.where(est_ok, g_action, fallback).astype(
            policy_action.dtype
        )
        gs = gs.replace(
            score=score, n_contact=n_contact, count=count,
            match=(dive_row if sticky_target else match),
            match_prev=match_prev, est_ok=est_ok,
            est=src, mode=est_ok.astype(jnp.int32),
            sweep_down=sweep_down, last_contact=last_contact,
            target=target,
        )
        return gs, action, est_ok

    step.needs_bank = True
    return init(), step
