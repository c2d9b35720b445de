from tpu_plume.core.config import (
    CurriculumConfig,
    EnvConfig,
    EvalConfig,
    PPOConfig,
    RolloutConfig,
    StopConfig,
    TrainConfig,
    get_preset,
    PRESETS,
)

__all__ = [
    "CurriculumConfig",
    "EnvConfig",
    "EvalConfig",
    "PPOConfig",
    "RolloutConfig",
    "StopConfig",
    "TrainConfig",
    "get_preset",
    "PRESETS",
]
