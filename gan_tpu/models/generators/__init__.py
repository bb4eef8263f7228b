from gan_tpu.models.generators.g01 import Generator1  # noqa: F401
from gan_tpu.models.generators.g02 import Generator2  # noqa: F401
from gan_tpu.models.generators.g03 import Generator3ProGAN  # noqa: F401
from gan_tpu.models.generators.g04 import Generator4  # noqa: F401
from gan_tpu.models.generators.g05 import Generator5  # noqa: F401
from gan_tpu.models.generators.g06 import Generator6  # noqa: F401
from gan_tpu.models.generators.g07 import Generator7  # noqa: F401
from gan_tpu.models.generators.g08 import (  # noqa: F401
    Generator8, Generator9, Generator10, Generator10_2, Generator11,
)
from gan_tpu.models.generators.g12 import Generator12  # noqa: F401
from gan_tpu.models.generators.g13 import Generator13  # noqa: F401
from gan_tpu.models.generators.g13_5 import Generator13_5  # noqa: F401
from gan_tpu.models.generators.g13_1 import Generator13_1  # noqa: F401
from gan_tpu.models.generators.g13_3 import Generator13_3, Generator13_4  # noqa: F401
from gan_tpu.models.generators.g14 import Generator14  # noqa: F401
