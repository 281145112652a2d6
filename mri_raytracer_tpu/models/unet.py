"""2-D U-Net segmentation baseline (reference M7, ``Final-1.ipynb §4``).

Architecture parity: 4-level encoder/decoder, DoubleConv =
(conv3x3 -> BN -> ReLU) x2, maxpool downs, transposed-conv ups with skip
concats, 1x1 head; in_ch=4 modalities -> 4 classes, base width 32.

Implemented in flax.linen (idiomatic JAX): batch stats live in a
``batch_stats`` collection; ``train=False`` uses running averages.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class DoubleConv(nn.Module):
    c_out: int

    @nn.compact
    def __call__(self, x, train: bool = True):
        for _ in range(2):
            x = nn.Conv(self.c_out, (3, 3), padding="SAME")(x)
            x = nn.BatchNorm(use_running_average=not train)(x)
            x = nn.relu(x)
        return x


class UNet2D(nn.Module):
    n_classes: int = 4
    base: int = 32

    @nn.compact
    def __call__(self, x, train: bool = True):
        b = self.base
        x1 = DoubleConv(b)(x, train)
        x2 = DoubleConv(b * 2)(nn.max_pool(x1, (2, 2), (2, 2)), train)
        x3 = DoubleConv(b * 4)(nn.max_pool(x2, (2, 2), (2, 2)), train)
        xb = DoubleConv(b * 8)(nn.max_pool(x3, (2, 2), (2, 2)), train)
        u = nn.ConvTranspose(b * 4, (2, 2), (2, 2))(xb)
        u = DoubleConv(b * 4)(jnp.concatenate([u, x3], -1), train)
        u = nn.ConvTranspose(b * 2, (2, 2), (2, 2))(u)
        u = DoubleConv(b * 2)(jnp.concatenate([u, x2], -1), train)
        u = nn.ConvTranspose(b, (2, 2), (2, 2))(u)
        u = DoubleConv(b)(jnp.concatenate([u, x1], -1), train)
        return nn.Conv(self.n_classes, (1, 1))(u)


def create_unet(key, in_ch: int = 4, n_classes: int = 4, base: int = 32,
                image_size: Tuple[int, int] = (64, 64)):
    """Returns (module, variables) with initialized params + batch stats.
    NHWC input; spatial dims must be divisible by 8 (3 poolings)."""
    model = UNet2D(n_classes=n_classes, base=base)
    x = jnp.zeros((1, *image_size, in_ch))
    variables = model.init(key, x, train=False)
    return model, variables


def unet_apply(model: UNet2D, variables, x, train: bool = False):
    """Logits (N,H,W,C); when train=True also returns updated batch stats."""
    if train:
        return model.apply(variables, x, train=True, mutable=["batch_stats"])
    return model.apply(variables, x, train=False)
