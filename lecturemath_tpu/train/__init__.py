from .dataset import LectureNetDataset
from .losses import bce_with_logits, masked_mse, phase_losses
from .trainer import TrainState, make_train_step, Trainer
