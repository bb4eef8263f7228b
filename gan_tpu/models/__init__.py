from gan_tpu.models.registry import build_generator, build_discriminator  # noqa: F401
from gan_tpu.models.registry import GENERATORS, DISCRIMINATORS  # noqa: F401
