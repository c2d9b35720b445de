"""Dynamic-stop controllers as jittable state machines, usable inside a
rollout ``lax.scan`` (so evaluation runs fully on device).

Three gates, matching the reference's three generations:

  - ``threshold_*``  — V2.0 ``ThresholdController``
    (PPOV2.0/evaluate_with_lstm.py:10-37): every 10 steps re-predict the
    source concentration from the last-10 scaled window, threshold =
    prediction * 0.95; stop once step >= 20 and (current conc >= threshold or
    window mean >= threshold).
  - ``peak_stop_*``  — V2.1 ``PeakAndStopPredictor`` gate
    (PPOV2.1/evaluate_with_lstm.py:73-81): stop when stop_prob > 0.8 on the
    last-20 conc window / 100.
  - ``heuristic_*``  — V1.1 ``ModelEvaluator._check_stop_condition``
    (PPOV1.1/evaluate_model.py:25-37): position std over last 10 steps < 2.0
    px and conc > 0.8 * peak.

Each controller is (init, step) where step takes the raw concentration (and
position for the heuristic) and returns (state', stop: bool).  Predictors are
passed as bound callables ``window -> prediction`` so LSTM params stay
closed over.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
from flax import struct

from tpu_plume.core.config import EvalConfig, StopConfig


def _push(ring: jnp.ndarray, value: jnp.ndarray) -> jnp.ndarray:
    return jnp.roll(ring, -1, axis=0).at[-1].set(value)


# ---------------------------------------------------------------------------
# V2.0 threshold controller
# ---------------------------------------------------------------------------


@struct.dataclass
class ThresholdState:
    window: jnp.ndarray     # f32[W] last W raw concentrations
    count: jnp.ndarray      # i32 steps observed
    threshold: jnp.ndarray  # f32 current threshold
    has_threshold: jnp.ndarray  # bool


def threshold_init(cfg: StopConfig) -> ThresholdState:
    return ThresholdState(
        window=jnp.zeros(cfg.evaluate_window, jnp.float32),
        count=jnp.int32(0),
        threshold=jnp.float32(0.0),
        has_threshold=jnp.bool_(False),
    )


def threshold_step(
    state: ThresholdState,
    conc: jnp.ndarray,
    predict_fn: Callable[[jnp.ndarray], jnp.ndarray],
    cfg: StopConfig,
):
    """``predict_fn`` maps a raw last-W window f32[W] to the predicted source
    concentration (scaling is the predictor's business — it owns the
    MinMaxScaler params)."""
    window = _push(state.window, conc)
    count = state.count + 1

    # Every 10 steps, once >= max(window, min_activate) steps seen
    # (evaluate_with_lstm.py:19-26, 90-91).
    refresh = (count % cfg.evaluate_window == 0) & (
        count >= max(cfg.evaluate_window, cfg.min_activate_steps)
    )
    pred = predict_fn(window)
    threshold = jnp.where(refresh, pred * cfg.threshold_scale, state.threshold)
    has_threshold = state.has_threshold | refresh

    stop = (
        (count >= cfg.min_activate_steps)
        & has_threshold
        & ((conc >= threshold) | (window.mean() >= threshold))
    )
    return (
        ThresholdState(window=window, count=count, threshold=threshold, has_threshold=has_threshold),
        stop,
    )


# ---------------------------------------------------------------------------
# V2.1 peak+stop gate
# ---------------------------------------------------------------------------


@struct.dataclass
class PeakStopState:
    window: jnp.ndarray   # f32[W] last W raw concentrations
    count: jnp.ndarray    # i32
    peak_pred: jnp.ndarray  # f32 latest peak prediction (diagnostic)


def peak_stop_init(cfg: StopConfig) -> PeakStopState:
    return PeakStopState(
        window=jnp.zeros(cfg.peak_stop_window, jnp.float32),
        count=jnp.int32(0),
        peak_pred=jnp.float32(jnp.nan),
    )


def peak_stop_step(
    state: PeakStopState,
    conc: jnp.ndarray,
    predict_fn: Callable[[jnp.ndarray], tuple[jnp.ndarray, jnp.ndarray]],
    cfg: StopConfig,
):
    """``predict_fn`` maps the normalized window f32[W] to (peak, stop_prob)."""
    window = _push(state.window, conc)
    count = state.count + 1
    peak, stop_prob = predict_fn(window / cfg.conc_norm)
    ready = count >= cfg.peak_stop_window
    stop = ready & (stop_prob > cfg.peak_stop_prob)
    peak_pred = jnp.where(ready, peak, state.peak_pred)
    return PeakStopState(window=window, count=count, peak_pred=peak_pred), stop


# ---------------------------------------------------------------------------
# V1.1 heuristic stop
# ---------------------------------------------------------------------------


@struct.dataclass
class HeuristicStopState:
    positions: jnp.ndarray  # f32[W, 2] last W positions
    count: jnp.ndarray      # i32


def heuristic_stop_init(cfg: EvalConfig) -> HeuristicStopState:
    return HeuristicStopState(
        positions=jnp.zeros((cfg.heuristic_position_window, 2), jnp.float32),
        count=jnp.int32(0),
    )


def heuristic_stop_step(
    state: HeuristicStopState,
    pos: jnp.ndarray,
    conc: jnp.ndarray,
    conc_peak: float,
    cfg: EvalConfig,
):
    """Stability + concentration gate (evaluate_model.py:25-37).

    ``conc`` is the true concentration at the agent's cell.  (The reference
    accidentally feeds ``info['concentration_reward'] * CONC_PEAK`` — i.e.
    2x the normalized conc — evaluate_model.py:61; corrected here, see
    SURVEY.md §7 "known reference bugs".)
    """
    positions = _push(state.positions, pos)
    count = state.count + 1
    pos_std = positions.std(axis=0).mean()
    ready = count >= cfg.heuristic_position_window
    stop = ready & (pos_std < cfg.heuristic_stability_threshold) & (
        conc > cfg.heuristic_conc_frac * conc_peak
    )
    return HeuristicStopState(positions=positions, count=count), stop
