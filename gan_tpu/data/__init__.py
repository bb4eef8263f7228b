from gan_tpu.data.datasets import ImageFolderDataset, SyntheticDataset  # noqa: F401
from gan_tpu.data.pipeline import DataLoader  # noqa: F401
