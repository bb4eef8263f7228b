from gan_tpu.train.state import GANTrainState, create_state  # noqa: F401
from gan_tpu.train.step import build_train_step, TrainStep  # noqa: F401
