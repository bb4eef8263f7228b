from gan_tpu.models.generators.g01 import Generator1  # noqa: F401
from gan_tpu.models.generators.g02 import Generator2  # noqa: F401
from gan_tpu.models.generators.g03 import Generator3ProGAN  # noqa: F401
from gan_tpu.models.generators.g04 import Generator4  # noqa: F401
from gan_tpu.models.generators.g05 import Generator5  # noqa: F401
