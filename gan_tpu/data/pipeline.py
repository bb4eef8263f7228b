"""Batched feed: host uint8 -> sharded device batches.

Replaces torch DataLoader(shuffle=True, drop_last=True)
(/root/reference/units/dataloader.py:29-32). Per-epoch shuffle with a numpy
Generator; batches are device_put with an optional NamedSharding so the
batch axis lands sharded across the `data` mesh axis (GSPMD global view).
"""

from typing import Iterator, Optional

import jax
import numpy as np


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = True,
        seed: int = 0,
        sharding: Optional[jax.sharding.Sharding] = None,
    ):
        self.dataset = dataset
        self.images = dataset.images
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.sharding = sharding
        self._rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        n = len(self.images)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator[jax.Array]:
        n = len(self.images)
        idx = np.arange(n)
        if self.shuffle:
            self._rng.shuffle(idx)
        from gan_tpu.data import native

        use_native = native.available()
        stop = (n // self.batch_size) * self.batch_size if self.drop_last else n
        for s in range(0, stop, self.batch_size):
            sel = idx[s : s + self.batch_size]
            if use_native:
                batch = native.gather(self.images, sel)
            else:
                batch = self.images[sel]
            if self.sharding is not None:
                yield jax.device_put(batch, self.sharding)
            else:
                yield jax.device_put(batch)
