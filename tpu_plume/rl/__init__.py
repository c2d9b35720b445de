from tpu_plume.rl.gae import compute_gae
from tpu_plume.rl.curriculum import CurriculumState, curriculum_init, curriculum_update
from tpu_plume.rl.ppo import PPOBatch, ppo_loss, ppo_update

__all__ = [
    "compute_gae",
    "CurriculumState",
    "curriculum_init",
    "curriculum_update",
    "PPOBatch",
    "ppo_loss",
    "ppo_update",
]
