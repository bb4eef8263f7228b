from gan_tpu.io.images import make_grid, save_image_grid  # noqa: F401
from gan_tpu.io.records import Recorder  # noqa: F401
from gan_tpu.io.checkpoint import CheckpointManager  # noqa: F401
