from tpu_plume.evaluation.harnesses import (
    EvalMetrics,
    evaluate_policy,
    generate_expert_data,
    make_heuristic_gate,
    make_peak_stop_gate,
    make_threshold_gate,
    summarize,
)

__all__ = [
    "EvalMetrics",
    "evaluate_policy",
    "generate_expert_data",
    "make_heuristic_gate",
    "make_peak_stop_gate",
    "make_threshold_gate",
    "summarize",
]
