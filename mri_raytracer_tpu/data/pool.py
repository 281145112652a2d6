"""Device-resident case pool.

The TPU-native answer to the reference's host sampling hotspot: a stacked
``(P, M, H, W, D)`` modality pool + ``(P, H, W, D)`` label pool living in HBM,
refreshed from the host every ``pool_refresh`` steps, with *all* sampling and
gathering done in-graph (generalizes reference T4,
``scripts/jax_inr_brats.py:546-682``).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class DevicePool:
    def __init__(self, cache, pool_size: int, seed: int = 0,
                 dtype=jnp.float32, sharding=None, with_boundary: bool = False):
        self.cache = cache
        self.pool_size = min(int(pool_size), cache.n_cases)
        self._rng = np.random.default_rng(seed)
        self._dtype = dtype
        self._sharding = sharding
        self._with_boundary = with_boundary
        self.mods: Optional[jnp.ndarray] = None
        self.segs: Optional[jnp.ndarray] = None
        self.boundary: Optional[jnp.ndarray] = None
        self.refresh()

    def refresh(self) -> None:
        idxs = self._rng.choice(self.cache.n_cases, size=self.pool_size, replace=False)
        mods = np.stack([self.cache.get(int(i))["mods"] for i in idxs])
        segs = np.stack([self.cache.get(int(i))["seg"] for i in idxs]).astype(np.int32)
        put = (lambda x: jax.device_put(x, self._sharding)) if self._sharding else jax.device_put
        self.mods = put(jnp.asarray(mods, dtype=self._dtype))
        self.segs = put(jnp.asarray(segs))
        if self._with_boundary:
            b = np.stack([self.cache.get(int(i)).get(
                "boundary", np.ones(segs.shape[1:], np.float32)) for i in idxs])
            self.boundary = put(jnp.asarray(b, dtype=self._dtype))

    @property
    def shape(self) -> Tuple[int, ...]:
        return tuple(self.mods.shape)

    def maybe_refresh(self, step: int, every: int) -> None:
        if every > 0 and step > 0 and step % every == 0:
            self.refresh()
