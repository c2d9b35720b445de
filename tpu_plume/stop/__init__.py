from tpu_plume.stop.controllers import (
    HeuristicStopState,
    PeakStopState,
    ThresholdState,
    heuristic_stop_init,
    heuristic_stop_step,
    peak_stop_init,
    peak_stop_step,
    threshold_init,
    threshold_step,
)

__all__ = [
    "HeuristicStopState",
    "PeakStopState",
    "ThresholdState",
    "heuristic_stop_init",
    "heuristic_stop_step",
    "peak_stop_init",
    "peak_stop_step",
    "threshold_init",
    "threshold_step",
]
