"""Training core: state, jitted alternating G/D step, checkpointing, logging."""

from tfcgan_tpu.train.state import GANTrainState, create_state
from tfcgan_tpu.train.trainer import Trainer, make_train_step
from tfcgan_tpu.train.checkpoint import save_checkpoint, restore_checkpoint
from tfcgan_tpu.train.log import JsonlLogger
