from tpu_plume.rollout.rollout import (
    EpisodeRecord,
    RolloutCarry,
    RolloutStep,
    init_rollout,
    rollout_chunk,
)

__all__ = [
    "EpisodeRecord",
    "RolloutCarry",
    "RolloutStep",
    "init_rollout",
    "rollout_chunk",
]
