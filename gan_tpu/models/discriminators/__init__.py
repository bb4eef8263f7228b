from gan_tpu.models.discriminators.d01 import Discriminator1  # noqa: F401
from gan_tpu.models.discriminators.d02 import Discriminator2  # noqa: F401
from gan_tpu.models.discriminators.d03 import (  # noqa: F401
    Discriminator3WGANGP,
    Discriminator3WGANGPSN,
    Discriminator3ProGAN,
)
