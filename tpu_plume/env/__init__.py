from tpu_plume.env.methane import (
    EnvState,
    RewardInfo,
    Transition,
    auto_reset,
    observe,
    reset,
    step,
)

__all__ = [
    "EnvState",
    "RewardInfo",
    "Transition",
    "auto_reset",
    "observe",
    "reset",
    "step",
]
