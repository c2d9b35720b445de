from tpu_plume.train.ppo_trainer import TrainResult, train_ppo

__all__ = ["TrainResult", "train_ppo"]
