from acoustic_image_generation_tpu.train.state import TrainState
from acoustic_image_generation_tpu.train.trainer import Trainer

__all__ = ["TrainState", "Trainer"]
