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
    uses the ENTIRE flight, O(K) state per env.
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
    (min_contact 4, check_every 2) because contact is the scarce
    resource on anisotropic ridges (~8 px wide vs 25 px moves — a
    surveyor reads a ridge ~1 cell in 3 line crossings) while the score
    separates in just a few in-plume samples: each contact read c adds
    ~c^2 to every row predicting background there (measured margin at 8
    contacts: 20x between the true row and the runner-up).
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
    already unambiguous.
  - once gated, ``guidance.phase_action`` drives the dive at the matched
    row's KNOWN source — same crossing geometry as the trilateration and
    learned guides.

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


def make_bank_guide(
    cfg: EnvConfig,
    num_rows: int,
    *,
    check_every: int = 2,
    min_contact: int = 4,
    margin: float = 1.0,
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
    setup_distance = deep_target + cfg.grid_size * cfg.move_frac - 1.0
    noise_mean = cfg.turbulence_intensity * (0.7978845608 + 0.1)
    # in-plume = 3 sigma of debiased turbulence noise above zero
    contact_floor = 3.0 * _NOISE_STD_FRAC * cfg.turbulence_intensity
    rows = jnp.arange(num_rows, dtype=jnp.int32)

    def init() -> BankGuideState:
        zi = jnp.zeros((), jnp.int32)
        return BankGuideState(
            score=jnp.zeros((num_rows,), jnp.float32),
            n_contact=zi, count=zi,
            match=zi, match_prev=jnp.full((), -1, jnp.int32),
            est_ok=jnp.zeros((), bool),
            est=jnp.zeros((2,), jnp.float32),
            mode=zi,
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
        score = gs.score + (obs - preds) ** 2
        n_contact = gs.n_contact + (
            conc - noise_mean >= contact_floor).astype(jnp.int32)
        count = gs.count + 1

        match = jnp.argmin(score).astype(jnp.int32)
        do_check = (count % check_every == 0) & (n_contact >= min_contact)
        stable = match == gs.match_prev
        if margin > 1.0:
            # top-2 smallest scores: commit only when the runner-up's
            # accumulated error exceeds the best's by the margin ratio
            neg2, _ = jax.lax.top_k(-score, 2)
            stable = stable & (-neg2[1] > margin * -neg2[0])
        est_ok = jnp.where(do_check, stable, gs.est_ok)
        match_prev = jnp.where(do_check, match, gs.match_prev)
        # steer at the latest argmin (not the checkpointed one): between
        # checks the argmin only moves if new evidence overturns it, and
        # the freshest identification is the best dive target
        src = bank.source[match]

        g_action = phase_action(
            pos[:2], src, cfg, terminate_radius, deep_target, setup_distance
        )
        action = jnp.where(est_ok, g_action, policy_action).astype(
            policy_action.dtype
        )
        gs = gs.replace(
            score=score, n_contact=n_contact, count=count,
            match=match, match_prev=match_prev, est_ok=est_ok,
            est=src, mode=est_ok.astype(jnp.int32),
        )
        return gs, action, est_ok

    step.needs_bank = True
    return init(), step
