from tpu_plume.obsv.metrics import EpisodeCSVLogger, Stopwatch, TrainLogger

__all__ = ["EpisodeCSVLogger", "Stopwatch", "TrainLogger"]
