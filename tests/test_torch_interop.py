"""Torch .pth checkpoint interop (reference C6, ``Final-1.ipynb §6,§12``):
a reference-trained torch teacher (U-Net M7, distilled MLP M8, nnU-Net
``checkpoint_final.pth``) must import into our pytrees and produce the
same outputs. torch(cpu) generates real reference-format checkpoints here;
the converters themselves never require torch at import time."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from mri_raytracer_tpu.io import checkpoint as ckpt  # noqa: E402


def _torch_mlp():
    # Same stack as the reference's distilled ImplicitMLP (Final-1.ipynb
    # §12): Linear(3,64) ReLU Linear(64,64) ReLU Linear(64,4).
    return torch.nn.Sequential(
        torch.nn.Linear(3, 64), torch.nn.ReLU(),
        torch.nn.Linear(64, 64), torch.nn.ReLU(),
        torch.nn.Linear(64, 4))


def test_torch_mlp_roundtrip(tmp_path):
    import jax.numpy as jnp

    from mri_raytracer_tpu.models.mlp import apply_mlp

    torch.manual_seed(0)
    net = _torch_mlp()
    p = tmp_path / "implicit_mlp.pth"
    torch.save(net.state_dict(), p)

    sd = ckpt.load_torch_state_dict(p)
    params = ckpt.torch_mlp_to_pytree(sd)
    assert [tuple(l["W"].shape) for l in params] == [(3, 64), (64, 64),
                                                     (64, 4)]
    x = np.random.default_rng(1).normal(size=(32, 3)).astype(np.float32)
    with torch.no_grad():
        want = net(torch.from_numpy(x)).numpy()
    got = np.asarray(apply_mlp([{k: jnp.asarray(v) for k, v in l.items()}
                                for l in params], jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_torch_state_dict_containers(tmp_path):
    net = _torch_mlp()
    # nnU-Net checkpoint_final.pth layout: weights under 'network_weights'
    # (reference scripts/nnunet_train_export.py:404-410).
    p = tmp_path / "checkpoint_final.pth"
    torch.save({"network_weights": net.state_dict(),
                "optimizer_state": {}, "current_epoch": 42}, p)
    sd = ckpt.load_torch_state_dict(p)
    assert "0.weight" in sd and sd["0.weight"].shape == (64, 3)
    # 'state_dict' wrapper
    p2 = tmp_path / "wrapped.pth"
    torch.save({"state_dict": net.state_dict()}, p2)
    assert ckpt.load_torch_state_dict(p2).keys() == sd.keys()


class _TorchDouble(torch.nn.Module):
    """Reference DoubleConv layout (Final-1.ipynb §4): Sequential of
    Conv/BN/ReLU x2 under attribute ``net`` — the attribute names fix the
    state_dict keys the converter must understand."""

    def __init__(self, ci, co):
        super().__init__()
        self.net = torch.nn.Sequential(
            torch.nn.Conv2d(ci, co, 3, padding=1), torch.nn.BatchNorm2d(co),
            torch.nn.ReLU(),
            torch.nn.Conv2d(co, co, 3, padding=1), torch.nn.BatchNorm2d(co),
            torch.nn.ReLU())

    def forward(self, x):
        return self.net(x)


class _TorchUNet(torch.nn.Module):
    """Reference UNet2D attribute layout (d1..d3, b, u3..u1, c3..c1, out) —
    only what's needed to emit reference-format state_dict keys and an
    eval-mode forward for the parity check."""

    def __init__(self, in_ch=4, n_classes=4, base=8):
        super().__init__()
        b = base
        self.d1, self.d2 = _TorchDouble(in_ch, b), _TorchDouble(b, b * 2)
        self.d3, self.b = _TorchDouble(b * 2, b * 4), _TorchDouble(b * 4,
                                                                   b * 8)
        self.u3 = torch.nn.ConvTranspose2d(b * 8, b * 4, 2, stride=2)
        self.c3 = _TorchDouble(b * 8, b * 4)
        self.u2 = torch.nn.ConvTranspose2d(b * 4, b * 2, 2, stride=2)
        self.c2 = _TorchDouble(b * 4, b * 2)
        self.u1 = torch.nn.ConvTranspose2d(b * 2, b, 2, stride=2)
        self.c1 = _TorchDouble(b * 2, b)
        self.out = torch.nn.Conv2d(b, n_classes, 1)

    def forward(self, x):
        pool = torch.nn.functional.max_pool2d
        x1 = self.d1(x)
        x2 = self.d2(pool(x1, 2))
        x3 = self.d3(pool(x2, 2))
        xb = self.b(pool(x3, 2))
        y = self.c3(torch.cat([self.u3(xb), x3], 1))
        y = self.c2(torch.cat([self.u2(y), x2], 1))
        y = self.c1(torch.cat([self.u1(y), x1], 1))
        return self.out(y)


def test_torch_unet_to_flax_parity(tmp_path):
    import jax.numpy as jnp

    from mri_raytracer_tpu.models.unet import UNet2D

    torch.manual_seed(0)
    base, n_classes = 8, 4
    net = _TorchUNet(base=base, n_classes=n_classes).eval()
    # Make BN running stats non-trivial so the batch_stats mapping is
    # actually exercised (fresh BN has mean=0/var=1 -> a no-op).
    with torch.no_grad():
        net.train()
        for _ in range(3):
            net(torch.randn(2, 4, 16, 16))
        net.eval()
    p = tmp_path / "unet_best.pth"
    torch.save(net.state_dict(), p)

    variables = ckpt.torch_unet_to_flax(ckpt.load_torch_state_dict(p))
    model = UNet2D(n_classes=n_classes, base=base)

    x = np.random.default_rng(2).normal(size=(1, 16, 16, 4)) \
        .astype(np.float32)
    with torch.no_grad():
        want = net(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy() \
            .transpose(0, 2, 3, 1)
    got = np.asarray(model.apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]}, jnp.asarray(x),
        train=False))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
