"""On-device voxel batch samplers (reference D11-D13, rebuilt in-graph).

Every sampler here is a pure jittable function over the device pool — no host
round-trips, no rejection loops with data-dependent trip counts. Biased
sampling is reformulated as *candidate oversampling + top-k selection*, which
has static shapes and vectorizes on the VPU:

  * uniform        — reference ``sample_batch`` (inr/inr/dataloader.py:133-155)
  * tumor-biased   — reference rejection sampler (jax_inr_brats.py:466-489):
                     draw C >= tb candidates, score = is_tumor + U(0,1), take
                     top tb. Tumor voxels win while they exist; the remainder
                     falls back to uniform — same semantics, one pass.
  * class-balanced — reference min-subclass quotas (jax_inr_brats.py:494-516)
  * hybrid         — 50/30/20 uncertainty/balanced/uniform mix (improved.ipynb
                     §9); the MC-dropout entropy scorer is injected by the
                     training engine.

All samplers return ``SampleBatch(norm_coords (B,3), intensities (B,M),
labels (B,), weights (B,))`` with coords normalized to [-1, 1] per axis
(reference convention ``coords/(dims-1)*2-1``).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


class SampleBatch(NamedTuple):
    coords: jnp.ndarray  # (B, 3) normalized [-1, 1]
    intensities: jnp.ndarray  # (B, M)
    labels: jnp.ndarray  # (B,) int32
    weights: jnp.ndarray  # (B,) per-sample loss weights (1.0 default)


def _normalize(ix, iy, iz, shape) -> jnp.ndarray:
    H, W, D = shape
    c = jnp.stack([ix, iy, iz], axis=-1).astype(jnp.float32)
    return (c / jnp.array([H - 1, W - 1, D - 1], jnp.float32)) * 2.0 - 1.0


def gather_pool(mods_pool, segs_pool, ci, ix, iy, iz):
    """Vectorized gather of (B,M) intensities + (B,) labels from a stacked pool."""
    intens = mods_pool[ci, :, ix, iy, iz]
    labels = segs_pool[ci, ix, iy, iz]
    return intens, labels.astype(jnp.int32)


def _random_idx(key, batch, pool_shape):
    P, _, H, W, D = pool_shape
    kc, kx, ky, kz = jax.random.split(key, 4)
    ci = jax.random.randint(kc, (batch,), 0, P)
    ix = jax.random.randint(kx, (batch,), 0, H)
    iy = jax.random.randint(ky, (batch,), 0, W)
    iz = jax.random.randint(kz, (batch,), 0, D)
    return ci, ix, iy, iz


def _boundary_weights(boundary_pool, ci, ix, iy, iz) -> jnp.ndarray:
    """Per-sample loss weights: boundary-map gather when available, else 1."""
    if boundary_pool is None:
        return jnp.ones(ci.shape, jnp.float32)
    return boundary_pool[ci, ix, iy, iz]


def sample_uniform(key, mods_pool, segs_pool, batch: int,
                   boundary_pool=None) -> SampleBatch:
    P, M, H, W, D = mods_pool.shape
    ci, ix, iy, iz = _random_idx(key, batch, mods_pool.shape)
    intens, labels = gather_pool(mods_pool, segs_pool, ci, ix, iy, iz)
    coords = _normalize(ix, iy, iz, (H, W, D))
    return SampleBatch(coords, intens, labels,
                       _boundary_weights(boundary_pool, ci, ix, iy, iz))


def _topk_select(score, k):
    """Indices of the k highest scores (static k)."""
    _, idx = jax.lax.top_k(score, k)
    return idx


def sample_tumor_biased(key, mods_pool, segs_pool, batch: int,
                        tumor_ratio: float, oversample: int = 4,
                        boundary_pool=None) -> SampleBatch:
    """`tb = batch*tumor_ratio` tumor-preferred samples + uniform remainder."""
    P, M, H, W, D = mods_pool.shape
    tb = int(round(batch * float(tumor_ratio)))
    rb = batch - tb
    k_cand, k_uni = jax.random.split(key)
    out_parts = []
    if tb > 0:
        C = max(tb * oversample, tb)
        kc, ks = jax.random.split(k_cand)
        ci, ix, iy, iz = _random_idx(kc, C, mods_pool.shape)
        labels_c = segs_pool[ci, ix, iy, iz]
        score = (labels_c > 0).astype(jnp.float32) * 2.0 + jax.random.uniform(ks, (C,))
        sel = _topk_select(score, tb)
        out_parts.append((ci[sel], ix[sel], iy[sel], iz[sel]))
    if rb > 0:
        out_parts.append(_random_idx(k_uni, rb, mods_pool.shape))
    ci = jnp.concatenate([p[0] for p in out_parts])
    ix = jnp.concatenate([p[1] for p in out_parts])
    iy = jnp.concatenate([p[2] for p in out_parts])
    iz = jnp.concatenate([p[3] for p in out_parts])
    intens, labels = gather_pool(mods_pool, segs_pool, ci, ix, iy, iz)
    return SampleBatch(_normalize(ix, iy, iz, (H, W, D)), intens, labels,
                       _boundary_weights(boundary_pool, ci, ix, iy, iz))


def _class_balanced_idx(key, segs_pool, pool_shape, batch: int,
                        min_counts: Tuple[int, int, int], oversample: int):
    """Index tuple (ci, ix, iy, iz) honoring per-class quotas for 1..3."""
    total_quota = int(sum(min_counts))
    if total_quota > batch:
        raise ValueError(f"sum(min_counts)={total_quota} > batch={batch}")
    keys = jax.random.split(key, 5)
    parts = []
    for cls, (need, kk) in enumerate(zip(min_counts, keys[:3]), start=1):
        if need <= 0:
            continue
        C = max(need * oversample, need)
        kc, ks = jax.random.split(kk)
        ci, ix, iy, iz = _random_idx(kc, C, pool_shape)
        labels_c = segs_pool[ci, ix, iy, iz]
        score = (labels_c == cls).astype(jnp.float32) * 2.0 + jax.random.uniform(ks, (C,))
        sel = _topk_select(score, need)
        parts.append((ci[sel], ix[sel], iy[sel], iz[sel]))
    rb = batch - total_quota
    if rb > 0:
        parts.append(_random_idx(keys[3], rb, pool_shape))
    return tuple(jnp.concatenate([p[i] for p in parts]) for i in range(4))


def sample_class_balanced(key, mods_pool, segs_pool, batch: int,
                          min_counts: Tuple[int, int, int],
                          oversample: int = 8,
                          boundary_pool=None) -> SampleBatch:
    """Per-class minimum quotas for classes 1..3, remainder uniform."""
    P, M, H, W, D = mods_pool.shape
    ci, ix, iy, iz = _class_balanced_idx(key, segs_pool, mods_pool.shape,
                                         batch, min_counts, oversample)
    intens, labels = gather_pool(mods_pool, segs_pool, ci, ix, iy, iz)
    return SampleBatch(_normalize(ix, iy, iz, (H, W, D)), intens, labels,
                       _boundary_weights(boundary_pool, ci, ix, iy, iz))


def sample_hybrid(key, mods_pool, segs_pool, batch: int,
                  uncertainty_fn: Optional[Callable] = None,
                  boundary_pool: Optional[jnp.ndarray] = None,
                  mix: Tuple[float, float, float] = (0.5, 0.3, 0.2),
                  balanced_counts: Tuple[int, int, int] = (0, 0, 0),
                  oversample: int = 4) -> SampleBatch:
    """Uncertainty-guided / class-balanced / uniform mix (reference D13).

    ``uncertainty_fn(coords, intensities) -> (C,) entropy`` scores candidate
    voxels (the engine passes an MC-dropout entropy closure over current
    params). Boundary weights are gathered from ``boundary_pool`` for EVERY
    sub-batch (uncertainty, balanced, and uniform alike).
    """
    n_unc = int(round(batch * mix[0]))
    n_bal = int(round(batch * mix[1]))
    n_uni = batch - n_unc - n_bal
    k1, k2, k3 = jax.random.split(key, 3)
    P, M, H, W, D = mods_pool.shape
    parts = []
    if n_unc > 0:
        C = max(n_unc * oversample, n_unc)
        kc, ks = jax.random.split(k1)
        ci, ix, iy, iz = _random_idx(kc, C, mods_pool.shape)
        if uncertainty_fn is not None:
            intens_c, _ = gather_pool(mods_pool, segs_pool, ci, ix, iy, iz)
            coords_c = _normalize(ix, iy, iz, (H, W, D))
            score = uncertainty_fn(coords_c, intens_c)
        else:
            score = jax.random.uniform(ks, (C,))
        sel = _topk_select(score, n_unc)
        parts.append((ci[sel], ix[sel], iy[sel], iz[sel]))
    if n_bal > 0:
        cnt = balanced_counts if sum(balanced_counts) > 0 else (
            n_bal // 3, n_bal // 3, n_bal - 2 * (n_bal // 3))
        parts.append(_class_balanced_idx(k2, segs_pool, mods_pool.shape,
                                         n_bal, cnt, oversample))
    if n_uni > 0:
        parts.append(_random_idx(k3, n_uni, mods_pool.shape))

    ci = jnp.concatenate([p[0] for p in parts])
    ix = jnp.concatenate([p[1] for p in parts])
    iy = jnp.concatenate([p[2] for p in parts])
    iz = jnp.concatenate([p[3] for p in parts])
    intens, labels = gather_pool(mods_pool, segs_pool, ci, ix, iy, iz)
    coords = _normalize(ix, iy, iz, (H, W, D))
    return SampleBatch(coords, intens, labels,
                       _boundary_weights(boundary_pool, ci, ix, iy, iz))


def make_sampler(kind: str, batch: int, tumor_ratio: float = 0.5,
                 min_counts: Optional[Tuple[int, int, int]] = None,
                 model=None, mc_dropout: int = 4):
    """Sampler factory keyed by DataConfig.sampler.

    All samplers share the protocol
    ``fn(key, mods, segs, params=None, boundary=None)``; only 'hybrid' uses
    ``params`` — it scores candidate voxels by MC-dropout predictive entropy
    of the CURRENT model inside the jitted step (reference D13 wiring the
    engine could not do host-side). ``boundary`` is an optional
    ``(P, H, W, D)`` boundary-distance weight pool gathered into per-sample
    loss weights (reference L8 boundary-weighted loss).
    """
    if kind == "uniform":
        return lambda key, mods, segs, params=None, boundary=None: \
            sample_uniform(key, mods, segs, batch, boundary)
    if kind == "tumor":
        return lambda key, mods, segs, params=None, boundary=None: \
            sample_tumor_biased(key, mods, segs, batch, tumor_ratio,
                                boundary_pool=boundary)
    if kind == "balanced":
        mc = min_counts or (batch // 8, batch // 8, batch // 8)
        return lambda key, mods, segs, params=None, boundary=None: \
            sample_class_balanced(key, mods, segs, batch, mc,
                                  boundary_pool=boundary)
    if kind == "hybrid":
        def hybrid(key, mods, segs, params=None, boundary=None):
            ufn = None
            if params is not None and model is not None:
                def ufn(coords, intens):
                    keys = jax.random.split(jax.random.fold_in(key, 7), mc_dropout)

                    def one(k):
                        logits = model.apply(params, coords, intens, rng=k,
                                             train=True)
                        return jax.nn.softmax(logits, axis=-1)

                    probs = jnp.mean(jax.vmap(one)(keys), axis=0)
                    return -jnp.sum(probs * jnp.log(probs + 1e-8), axis=-1)

            return sample_hybrid(key, mods, segs, batch, uncertainty_fn=ufn,
                                 boundary_pool=boundary)

        return hybrid
    raise ValueError(f"unknown sampler {kind!r}")


def sample_batch_host(rng_key, batch_size: int, cache, vol_shape) -> SampleBatch:
    """Host-cache path for API parity with reference ``sample_batch``."""
    import numpy as np

    H, W, D = vol_shape
    kc, kx, ky, kz = jax.random.split(rng_key, 4)
    ci = np.asarray(jax.random.randint(kc, (batch_size,), 0, cache.n_cases))
    xs = np.asarray(jax.random.randint(kx, (batch_size,), 0, H))
    ys = np.asarray(jax.random.randint(ky, (batch_size,), 0, W))
    zs = np.asarray(jax.random.randint(kz, (batch_size,), 0, D))
    intens, labels = cache.sample_voxels(ci, xs, ys, zs)
    coords = _normalize(jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(zs), (H, W, D))
    return SampleBatch(coords, jnp.asarray(intens), jnp.asarray(labels, dtype=jnp.int32),
                       jnp.ones((batch_size,), jnp.float32))
