"""Orbital camera + primary-ray generation.

Behavioral parity with the reference's two camera variants
(``inr/viewer/camera.py`` — arbitrary world-up with robust basis;
``scripts/raymarch/camera.py`` — fixed Y-up), and with the per-pixel pinhole
ray construction in every reference shader (``inr/viewer/brats_rt.slang:36-46``).

The camera itself is host-side state (pure numpy, cheap, mutated by UI events);
``camera_rays`` is the traced JAX function that turns a basis into per-pixel
ray directions — it takes the basis as arrays so interactive camera motion
never retriggers compilation.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp
import numpy as np


class CameraBasis(NamedTuple):
    """Ray-generation inputs, all JAX-traceable arrays."""

    eye: jnp.ndarray  # (3,)
    right: jnp.ndarray  # (3,) "U"
    up: jnp.ndarray  # (3,) "V"
    forward: jnp.ndarray  # (3,) "W"
    fov_y: jnp.ndarray  # () radians

    def pack(self) -> np.ndarray:
        """Flatten to one (13,) vector (single-transfer frame update)."""
        return np.concatenate([
            np.asarray(self.eye, np.float32), np.asarray(self.right, np.float32),
            np.asarray(self.up, np.float32), np.asarray(self.forward, np.float32),
            np.asarray(self.fov_y, np.float32).reshape(1)])


def unpack_basis(vec: jnp.ndarray) -> CameraBasis:
    """In-graph inverse of ``CameraBasis.pack``."""
    return CameraBasis(vec[0:3], vec[3:6], vec[6:9], vec[9:12], vec[12])


class OrbitalCamera:
    """Spherical orbit / pan / zoom camera with arbitrary ``world_up``."""

    def __init__(
        self,
        target: Optional[np.ndarray] = None,
        radius: float = 2.0,
        phi: float = math.pi * 0.5,
        theta: float = 0.0,
        min_radius: float = 0.1,
        max_radius: float = 100.0,
        min_phi: float = 0.01,
        max_phi: float = math.pi - 0.01,
        fov_y: float = math.radians(55.0),
        near: float = 0.1,
        far: float = 1000.0,
        world_up: Optional[np.ndarray] = None,
    ):
        self._init_state = dict(
            target=np.zeros(3, np.float32) if target is None else np.asarray(target, np.float32),
            radius=float(radius), phi=float(phi), theta=float(theta),
            min_radius=float(min_radius), max_radius=float(max_radius),
            min_phi=float(min_phi), max_phi=float(max_phi),
        )
        self.fov_y = float(fov_y)
        self.near = float(near)
        self.far = float(far)
        self.world_up = (np.asarray(world_up, np.float32) if world_up is not None
                         else np.array([0.0, 1.0, 0.0], np.float32))
        self.reset()

    def reset(self) -> None:
        s = self._init_state
        self.target = s["target"].copy()
        self.radius, self.phi, self.theta = s["radius"], s["phi"], s["theta"]
        self.min_radius, self.max_radius = s["min_radius"], s["max_radius"]
        self.min_phi, self.max_phi = s["min_phi"], s["max_phi"]

    # -------------------------------------------------------------- geometry
    def _base_frame(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Orthonormal (right, forward, up) frame around ``world_up``."""
        wu = self.world_up
        ref = np.array([0.0, 0.0, 1.0], np.float32)
        if abs(float(np.dot(wu, ref))) > 0.999:
            ref = np.array([1.0, 0.0, 0.0], np.float32)
        r = np.cross(ref, wu)
        n = float(np.linalg.norm(r))
        r = r / n if n >= 1e-6 else np.array([1.0, 0.0, 0.0], np.float32)
        f = np.cross(wu, r)
        n = float(np.linalg.norm(f))
        if n > 0:
            f = f / n
        return r.astype(np.float32), f.astype(np.float32), wu

    def eye_position(self) -> np.ndarray:
        r, f, u = self._base_frame()
        s, c = math.sin(self.phi), math.cos(self.phi)
        d = (s * math.cos(self.theta)) * r + (s * math.sin(self.theta)) * f + c * u
        return (self.target + self.radius * d).astype(np.float32)

    def get_basis(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """(eye, right, up, forward) — the U/V/W consumed by the marchers."""
        eye = self.eye_position()
        fwd = self.target - eye
        n = float(np.linalg.norm(fwd))
        fwd = fwd / n if n >= 1e-6 else np.array([0.0, 0.0, -1.0], np.float32)
        right = np.cross(fwd, self.world_up)
        n = float(np.linalg.norm(right))
        if n < 1e-6:
            right, _, _ = self._base_frame()
            n = float(np.linalg.norm(right))
        if n > 0:
            right = right / n
        up = np.cross(right, fwd)
        # Keep up aligned with world_up hemisphere to avoid flips at the poles.
        if float(np.dot(up, self.world_up)) < 0.0:
            up, right = -up, -right
        return (eye.astype(np.float32), right.astype(np.float32),
                up.astype(np.float32), fwd.astype(np.float32))

    def basis(self) -> CameraBasis:
        """Host-side (numpy) basis pytree; renderers pack it into a single
        (13,) vector so each frame costs ONE host->device transfer."""
        eye, right, up, fwd = self.get_basis()
        return CameraBasis(eye, right, up, fwd, np.float32(self.fov_y))

    # ------------------------------------------------------------ interaction
    def orbit(self, d_theta: float, d_phi: float) -> None:
        self.theta += float(d_theta)
        self.phi = min(self.max_phi, max(self.min_phi, self.phi + float(d_phi)))

    def pan(self, dx: float, dy: float, viewport_height: Optional[float] = None) -> None:
        _, right, up, _ = self.get_basis()
        px = float(viewport_height) if viewport_height and viewport_height > 0 else 720.0
        view_h = 2.0 * self.radius * math.tan(max(1e-3, self.fov_y * 0.5))
        scale = view_h / max(1.0, px)
        self.target = (self.target - right * (float(dx) * scale)
                       + up * (float(dy) * scale)).astype(np.float32)

    def zoom(self, factor: float) -> None:
        self.radius = min(self.max_radius, max(self.min_radius, self.radius * float(factor)))

    def set_fov_degrees(self, deg: float) -> None:
        self.fov_y = math.radians(float(deg))


def camera_rays(basis: CameraBasis, width: int, height: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Primary rays for every pixel.

    Matches the shader-side pinhole construction
    (``inr/viewer/brats_rt.slang:36-46``): pixel centers -> NDC in [-1,1],
    ``f = 1/tan(fov_y/2)``, camera dir ``(u*aspect/f, -v/f, 1)`` normalized,
    then rotated into the world basis.

    Returns:
        origins  (H, W, 3) — broadcast eye
        dirs     (H, W, 3) — unit directions
    """
    xs = (jnp.arange(width, dtype=jnp.float32) + 0.5) / width
    ys = (jnp.arange(height, dtype=jnp.float32) + 0.5) / height
    return _rays_from_ndc(basis, xs, ys, width, height)


def camera_rays_window(basis: CameraBasis, width: int, height: int,
                       x0, y0, win_w: int, win_h: int
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Primary rays for the pixel window [y0:y0+win_h, x0:x0+win_w] of a
    ``width x height`` image — identical per-pixel math to ``camera_rays``
    (a window ray equals the full-frame ray of the same pixel bit-exactly,
    so a foveated inset composites seamlessly). ``x0``/``y0`` may be traced
    scalars; the window SIZE is static."""
    x0 = jnp.asarray(x0, jnp.float32)
    y0 = jnp.asarray(y0, jnp.float32)
    xs = (x0 + jnp.arange(win_w, dtype=jnp.float32) + 0.5) / width
    ys = (y0 + jnp.arange(win_h, dtype=jnp.float32) + 0.5) / height
    return _rays_from_ndc(basis, xs, ys, width, height)


def _rays_from_ndc(basis: CameraBasis, xs: jnp.ndarray, ys: jnp.ndarray,
                   width: int, height: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    h, w = ys.shape[0], xs.shape[0]
    u = xs * 2.0 - 1.0  # (w,)
    v = ys * 2.0 - 1.0  # (h,)
    f = 1.0 / jnp.tan(0.5 * basis.fov_y)
    aspect = width / max(1.0, float(height))
    cx = (u * aspect / f)[None, :]  # (1, w)
    cy = (-v / f)[:, None]  # (h, 1)
    cz = jnp.ones((h, w), jnp.float32)
    cam = jnp.stack([jnp.broadcast_to(cx, (h, w)),
                     jnp.broadcast_to(cy, (h, w)), cz], axis=-1)
    cam = cam / jnp.linalg.norm(cam, axis=-1, keepdims=True)
    d = (cam[..., 0:1] * basis.right + cam[..., 1:2] * basis.up
         + cam[..., 2:3] * basis.forward)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.broadcast_to(basis.eye, (h, w, 3))
    return o, d
