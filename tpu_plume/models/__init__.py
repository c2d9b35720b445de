from tpu_plume.models.actor_critic import ActorCritic
from tpu_plume.models.discriminator import Discriminator
from tpu_plume.models.recurrent import RecurrentActorCritic
from tpu_plume.models.lstm_zoo import (
    ConcentrationPredictor,
    ConcentrationThresholdPredictor,
    GaussianLSTM,
    GaussianParamAndStopPredictor,
    GaussianParamPredictor,
    LSTMModel,
    PeakAndStopPredictor,
)

__all__ = [
    "ActorCritic",
    "Discriminator",
    "RecurrentActorCritic",
    "ConcentrationPredictor",
    "ConcentrationThresholdPredictor",
    "GaussianLSTM",
    "GaussianParamAndStopPredictor",
    "GaussianParamPredictor",
    "LSTMModel",
    "PeakAndStopPredictor",
]
