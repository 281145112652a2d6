"""Axial-slice dataset + prefetch pipeline (reference D7, D14).

  * ``build_slice_index`` — (case, z) manifest with background-slice
    dropping (keep slices whose tumor fraction >= ``min_fg_frac`` plus a
    quota of background slices), reference ``build_indexed_slices``
  * ``slice_batches`` — shuffled minibatch generator of (N,H,W,C) images +
    (N,H,W) labels, padded to pool-friendly sizes
  * ``prefetch`` — daemon-thread queue + ``jax.device_put`` double-buffering
    (reference ``prefetch_generator``, ``neumors_inr_jax.ipynb §9``)
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, List, Optional, Sequence, Tuple

import jax
import numpy as np


def build_slice_index(cache, min_fg_frac: float = 0.0,
                      bg_keep_ratio: float = 0.3, seed: int = 0
                      ) -> List[Tuple[int, int]]:
    """(case_idx, z) pairs; drops most background-only slices."""
    rng = np.random.default_rng(seed)
    index: List[Tuple[int, int]] = []
    for ci in range(cache.n_cases):
        seg = cache.get(ci)["seg"]
        for z in range(seg.shape[-1]):
            fg = float((seg[..., z] > 0).mean())
            if fg > min_fg_frac:
                index.append((ci, z))
            elif rng.uniform() < bg_keep_ratio:
                index.append((ci, z))
    return index


def _pad_to(x: np.ndarray, mult: int = 8) -> np.ndarray:
    H, W = x.shape[:2]
    ph, pw = (-H) % mult, (-W) % mult
    if ph or pw:
        pad = [(0, ph), (0, pw)] + [(0, 0)] * (x.ndim - 2)
        x = np.pad(x, pad)
    return x


def slice_batches(cache, index: Sequence[Tuple[int, int]], batch_size: int,
                  seed: int = 0, epochs: Optional[int] = 1,
                  pad_mult: int = 8) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Yields (imgs (N,H,W,M) f32, labels (N,H,W) i32), shuffled per epoch."""
    rng = np.random.default_rng(seed)
    epoch = 0
    while epochs is None or epoch < epochs:
        order = rng.permutation(len(index))
        for s in range(0, len(order) - batch_size + 1, batch_size):
            imgs, labs = [], []
            for k in order[s:s + batch_size]:
                ci, z = index[k]
                case = cache.get(ci)
                img = np.moveaxis(case["mods"][:, :, :, z], 0, -1)
                imgs.append(_pad_to(img.astype(np.float32), pad_mult))
                labs.append(_pad_to(case["seg"][:, :, z].astype(np.int32),
                                    pad_mult))
            yield np.stack(imgs), np.stack(labs)
        epoch += 1


def prefetch(gen: Iterator, max_prefetch: int = 2, device=None) -> Iterator:
    """Daemon-thread prefetcher that device_puts batches ahead of use."""
    q: "queue.Queue" = queue.Queue(maxsize=max_prefetch)
    _END = object()

    def worker():
        try:
            for item in gen:
                q.put(jax.device_put(item, device))
        finally:
            q.put(_END)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            return
        yield item
