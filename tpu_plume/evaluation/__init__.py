from tpu_plume.evaluation.flux import (
    flux_inversion_study,
    invert_fluxes,
    source_observability,
)
from tpu_plume.evaluation.harnesses import (
    EvalMetrics,
    evaluate_policy,
    generate_expert_data,
    make_heuristic_gate,
    make_peak_stop_gate,
    make_threshold_gate,
    summarize,
)
from tpu_plume.evaluation.oracle import ORACLE_KINDS, make_oracle

__all__ = [
    "ORACLE_KINDS",
    "make_oracle",
    "EvalMetrics",
    "evaluate_policy",
    "flux_inversion_study",
    "generate_expert_data",
    "invert_fluxes",
    "make_heuristic_gate",
    "make_peak_stop_gate",
    "make_threshold_gate",
    "source_observability",
    "summarize",
]
