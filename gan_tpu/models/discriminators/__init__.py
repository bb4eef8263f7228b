from gan_tpu.models.discriminators.d01 import Discriminator1  # noqa: F401
from gan_tpu.models.discriminators.d02 import Discriminator2  # noqa: F401
from gan_tpu.models.discriminators.d03 import (  # noqa: F401
    Discriminator3WGANGP,
    Discriminator3WGANGPSN,
    Discriminator3ProGAN,
)
from gan_tpu.models.discriminators.d04 import Discriminator4  # noqa: F401
from gan_tpu.models.discriminators.d05 import (  # noqa: F401
    Discriminator5, Discriminator5WGANGP, Discriminator5WGANGPSN,
)
from gan_tpu.models.discriminators.d06 import Discriminator6WGANGP  # noqa: F401
from gan_tpu.models.discriminators.d07 import (  # noqa: F401
    Discriminator7WGANGP, Discriminator7WGANGPSN,
)
from gan_tpu.models.discriminators.d08 import Discriminator8  # noqa: F401
from gan_tpu.models.discriminators.d09 import (  # noqa: F401
    Discriminator9, Discriminator9_2, Discriminator9_3, Discriminator9_4,
    Discriminator9Small,
)
