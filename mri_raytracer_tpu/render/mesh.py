"""Triangle-mesh ray tracing (reference R3 + H3/H4/H5).

Host side: minimal ASCII PLY loader (``scripts/mesh_rt/ply_loader.py``
parity), unit-box normalization, and a median-split BVH builder with the
reference's exact node encoding (8 floats per node; inner nodes mark the
right child as ``-(right+1)`` in the count slot — ``scripts/mesh_rt/bvh.py``).

Device side, two tracers:
  * ``trace_brute`` — the TPU-native path for interactive mesh sizes:
    a lax.scan over triangle chunks with ALL pixels testing ALL triangles
    (vectorized Moller-Trumbore, zero gathers; the reference meshes are
    1e3-1e4 tris, where dense beats divergent traversal on this hardware).
  * ``trace_bvh`` — masked fixed-depth stack traversal (depth 64, matching
    ``mesh_rt.slang:84``) in a lax.while_loop, for large meshes.

Shading matches ``mesh_rt.slang:147-162``: two-sided N.L + distance AO on
hit, vertical sky gradient on miss.
"""

from __future__ import annotations

import functools
import pathlib
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mri_raytracer_tpu.render.camera import CameraBasis, camera_rays


# ------------------------------------------------------------------ PLY (H5)
def load_ply_ascii(path, max_faces: Optional[int] = None
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """ASCII PLY -> (verts (V,3) f32, tris (T,3) u32). Faces with >3 verts
    are fan-triangulated; ``max_faces`` caps the triangle count."""
    lines = pathlib.Path(path).read_text().splitlines()
    if not lines or lines[0].strip() != "ply":
        raise ValueError(f"{path}: not a PLY file")
    n_vert = n_face = 0
    header_end = 0
    fmt_ok = False
    for i, ln in enumerate(lines):
        t = ln.split()
        if not t:
            continue
        if t[0] == "format":
            fmt_ok = t[1] == "ascii"
        elif t[0] == "element" and t[1] == "vertex":
            n_vert = int(t[2])
        elif t[0] == "element" and t[1] == "face":
            n_face = int(t[2])
        elif t[0] == "end_header":
            header_end = i + 1
            break
    if not fmt_ok:
        raise ValueError(f"{path}: only ascii PLY supported")
    verts = np.array([[float(x) for x in lines[header_end + i].split()[:3]]
                      for i in range(n_vert)], np.float32)
    tris = []
    for i in range(n_face):
        t = lines[header_end + n_vert + i].split()
        cnt = int(t[0])
        idx = [int(x) for x in t[1:1 + cnt]]
        for k in range(1, cnt - 1):  # fan triangulation
            tris.append([idx[0], idx[k], idx[k + 1]])
        if max_faces is not None and len(tris) >= max_faces:
            break
    return verts, np.asarray(tris, np.uint32)


def normalize_to_unit_box(verts: np.ndarray) -> np.ndarray:
    """Center at origin, scale so the largest extent spans [-1, 1]
    (reference ``scripts/mesh_rt/app.py`` load path)."""
    lo, hi = verts.min(0), verts.max(0)
    center = 0.5 * (lo + hi)
    scale = 2.0 / max(float((hi - lo).max()), 1e-9)
    return ((verts - center) * scale).astype(np.float32)


# ------------------------------------------------------------------ BVH (H4)
@dataclass
class BVH:
    nodes: np.ndarray  # (N, 8): bmin(3), bmax(3), leftFirst, countOrNegRight
    tris: np.ndarray  # (M, 3) uint32, leaf-compacted order
    verts: np.ndarray  # (V, 3) float32


def build_bvh(verts: np.ndarray, tris: np.ndarray, max_leaf_tris: int = 4) -> BVH:
    """SAH-less median split on the largest centroid axis; leaf-compacted
    triangle list; inner nodes encode right child as -(right+1)."""
    V = verts.astype(np.float32, copy=False)
    T = tris.astype(np.uint32, copy=False)
    cent = V[T].mean(axis=1)
    bmin_t = V[T].min(axis=1)
    bmax_t = V[T].max(axis=1)

    nodes = []  # [bmin, bmax, leftFirst, count]
    leaf_order = []

    def rec(ids: np.ndarray) -> int:
        bmin = bmin_t[ids].min(0)
        bmax = bmax_t[ids].max(0)
        me = len(nodes)
        nodes.append([bmin, bmax, 0, 0])
        if len(ids) <= max_leaf_tris:
            nodes[me][2] = len(leaf_order)
            nodes[me][3] = len(ids)
            leaf_order.extend(int(t) for t in ids)
            return me
        cmin = cent[ids].min(0)
        cmax = cent[ids].max(0)
        axis = int(np.argmax(cmax - cmin))
        order = np.argsort(cent[ids, axis], kind="stable")
        mid = len(ids) // 2
        left = rec(ids[order[:mid]])
        right = rec(ids[order[mid:]])
        nodes[me][2] = left
        nodes[me][3] = -(right + 1)
        return me

    rec(np.arange(len(T), dtype=np.int64))
    packed = np.zeros((len(nodes), 8), np.float32)
    for i, (bmin, bmax, lf, cnt) in enumerate(nodes):
        packed[i, 0:3] = bmin
        packed[i, 3:6] = bmax
        packed[i, 6] = lf
        packed[i, 7] = cnt
    return BVH(nodes=packed, tris=T[np.asarray(leaf_order, np.int64)], verts=V)


# ----------------------------------------------------------------- intersect
def _moller_trumbore(ro, rd, a, b, c, eps: float = 1e-8):
    """Vectorized ray-triangle test. ro/rd (..., 3); a/b/c (T, 3).
    Returns (t (..., T), valid (..., T), n (T, 3))."""
    ab = b - a
    ac = c - a
    n = jnp.cross(ab, ac)
    p = jnp.cross(rd[..., None, :], ac[None, None])  # (..., T, 3)
    det = jnp.sum(ab[None, None] * p, axis=-1)
    inv = 1.0 / jnp.where(jnp.abs(det) < eps, eps, det)
    s = ro[..., None, :] - a[None, None]
    u = jnp.sum(s * p, axis=-1) * inv
    q = jnp.cross(s, ab[None, None])
    v = jnp.sum(rd[..., None, :] * q, axis=-1) * inv
    t = jnp.sum(ac[None, None] * q, axis=-1) * inv
    valid = (jnp.abs(det) >= eps) & (u >= 0) & (u <= 1) & (v >= 0) \
        & (u + v <= 1) & (t > 1e-5)
    return t, valid, n


@functools.partial(jax.jit, static_argnames=("chunk",))
def trace_brute(ro: jnp.ndarray, rd: jnp.ndarray, verts: jnp.ndarray,
                tris: jnp.ndarray, chunk: int = 512):
    """Closest hit over all triangles, scanning triangle chunks.
    Returns (t (H,W), normal (H,W,3), hit (H,W))."""
    T = tris.shape[0]
    pad = (-T) % chunk
    tri_pad = jnp.pad(tris.astype(jnp.int32), ((0, pad), (0, 0)))
    tri_valid = jnp.pad(jnp.ones((T,), bool), (0, pad))
    A = verts[tri_pad[:, 0]].reshape(-1, chunk, 3)
    B = verts[tri_pad[:, 1]].reshape(-1, chunk, 3)
    C = verts[tri_pad[:, 2]].reshape(-1, chunk, 3)
    Vd = tri_valid.reshape(-1, chunk)

    def body(carry, abcv):
        t_best, n_best = carry
        a, b, c, vmask = abcv
        t, valid, n = _moller_trumbore(ro, rd, a, b, c)
        t = jnp.where(valid & vmask[None, None], t, jnp.inf)
        idx = jnp.argmin(t, axis=-1)
        t_min = jnp.take_along_axis(t, idx[..., None], axis=-1)[..., 0]
        n_min = n[idx]
        better = t_min < t_best
        t_best = jnp.where(better, t_min, t_best)
        n_best = jnp.where(better[..., None], n_min, n_best)
        return (t_best, n_best), None

    t0 = jnp.full(ro.shape[:-1], jnp.inf)
    n0 = jnp.zeros(ro.shape[:-1] + (3,))
    (t_best, n_best), _ = jax.lax.scan(body, (t0, n0), (A, B, C, Vd))
    return t_best, n_best, jnp.isfinite(t_best)


def _aabb_t(ro, rcp, bmin, bmax):
    t0 = (bmin - ro) * rcp
    t1 = (bmax - ro) * rcp
    tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
    return tn, (tf >= jnp.maximum(tn, 0.0))


@functools.partial(jax.jit, static_argnames=("max_leaf_tris", "stack_depth"))
def trace_bvh(ro: jnp.ndarray, rd: jnp.ndarray, nodes: jnp.ndarray,
              tris: jnp.ndarray, verts: jnp.ndarray,
              max_leaf_tris: int = 4, stack_depth: int = 64):
    """Near-first BVH traversal with a per-ray masked stack (all rays advance
    in lockstep through their own stacks; finished rays idle)."""
    shp = ro.shape[:-1]
    rdn = jnp.where(jnp.abs(rd) < 1e-8, jnp.where(rd >= 0, 1e-8, -1e-8), rd)
    rcp = 1.0 / rdn
    va = verts[tris[:, 0].astype(jnp.int32)]
    vb = verts[tris[:, 1].astype(jnp.int32)]
    vc = verts[tris[:, 2].astype(jnp.int32)]

    stack = jnp.zeros(shp + (stack_depth,), jnp.int32)
    sp = jnp.ones(shp, jnp.int32)  # root pushed
    t_best = jnp.full(shp, jnp.inf)
    n_best = jnp.zeros(shp + (3,))

    def cond(state):
        sp, *_ = state
        return jnp.any(sp > 0)

    def body(state):
        sp, stack, t_best, n_best = state
        active = sp > 0
        top = jnp.maximum(sp - 1, 0)
        ni = jnp.take_along_axis(stack, top[..., None], axis=-1)[..., 0]
        sp = jnp.where(active, sp - 1, sp)

        node = nodes[ni]  # (..., 8) gather
        bmin, bmax = node[..., 0:3], node[..., 3:6]
        tn, hit_box = _aabb_t(ro, rcp, bmin, bmax)
        visit = active & hit_box & (tn <= t_best)
        left_first = node[..., 6].astype(jnp.int32)
        cnt = jnp.round(node[..., 7]).astype(jnp.int32)
        is_leaf = cnt > 0

        # Leaf: test up to max_leaf_tris triangles.
        for k in range(max_leaf_tris):
            ti = jnp.clip(left_first + k, 0, va.shape[0] - 1)
            do = visit & is_leaf & (k < cnt)
            a, b, c = va[ti], vb[ti], vc[ti]
            ab = b - a
            ac = c - a
            n = jnp.cross(ab, ac)
            p = jnp.cross(rd, ac)
            det = jnp.sum(ab * p, axis=-1)
            inv = 1.0 / jnp.where(jnp.abs(det) < 1e-8, 1e-8, det)
            s = ro - a
            u = jnp.sum(s * p, axis=-1) * inv
            q = jnp.cross(s, ab)
            v = jnp.sum(rd * q, axis=-1) * inv
            t = jnp.sum(ac * q, axis=-1) * inv
            ok = do & (jnp.abs(det) >= 1e-8) & (u >= 0) & (u <= 1) \
                & (v >= 0) & (u + v <= 1) & (t > 1e-5) & (t < t_best)
            t_best = jnp.where(ok, t, t_best)
            n_best = jnp.where(ok[..., None], n, n_best)

        # Inner: push children near-first.
        right = -cnt - 1
        inner = visit & ~is_leaf
        ln = nodes[jnp.clip(left_first, 0, nodes.shape[0] - 1)]
        rn = nodes[jnp.clip(right, 0, nodes.shape[0] - 1)]
        tl, hl = _aabb_t(ro, rcp, ln[..., 0:3], ln[..., 3:6])
        tr, hr = _aabb_t(ro, rcp, rn[..., 0:3], rn[..., 3:6])
        hl = hl & inner & (tl <= t_best)
        hr = hr & inner & (tr <= t_best)
        near_is_left = tl < tr
        first = jnp.where(near_is_left, left_first, right)
        second = jnp.where(near_is_left, right, left_first)
        first_ok = jnp.where(near_is_left, hl, hr)
        second_ok = jnp.where(near_is_left, hr, hl)

        def push(sp, stack, idx, ok):
            pos = jnp.minimum(sp, stack_depth - 1)
            upd = jnp.take_along_axis(stack, pos[..., None], axis=-1)[..., 0]
            newv = jnp.where(ok, idx, upd)
            stack = jnp.where(
                (jnp.arange(stack_depth) == pos[..., None]) & ok[..., None],
                idx[..., None], stack)
            sp = jnp.where(ok, jnp.minimum(sp + 1, stack_depth), sp)
            return sp, stack

        # Far child first so the near child pops first.
        sp, stack = push(sp, stack, second, second_ok)
        sp, stack = push(sp, stack, first, first_ok)
        return sp, stack, t_best, n_best

    sp, stack, t_best, n_best = jax.lax.while_loop(
        cond, body, (sp, stack, t_best, n_best))
    return t_best, n_best, jnp.isfinite(t_best)


# ------------------------------------------------------------------ renderer
def shade(ro, rd, t, n, hit) -> jnp.ndarray:
    """Reference shading (mesh_rt.slang:147-162)."""
    nn = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    # two-sided
    flip = jnp.sum(nn * rd, axis=-1) > 0.0
    nn = jnp.where(flip[..., None], -nn, nn)
    l = jnp.array([0.3, 0.8, 0.5])
    l = l / jnp.linalg.norm(l)
    ndotl = jnp.maximum(0.0, jnp.sum(nn * l, axis=-1))
    t_safe = jnp.where(hit, t, 0.0)
    ao = 0.3 + 0.7 * jnp.clip(1.0 - 0.05 * t_safe, 0.0, 1.0)
    color = ((0.15 + ndotl) * ao)[..., None] * jnp.array([0.8, 0.7, 0.6])
    tbg = 0.5 * (rd[..., 1] + 1.0)
    sky = ((1.0 - tbg[..., None]) * jnp.array([0.05, 0.06, 0.08])
           + tbg[..., None] * jnp.array([0.2, 0.25, 0.3]))
    return jnp.where(hit[..., None], color, sky)


class MeshRenderer:
    """Reference H3 equivalent: PLY -> normalize -> BVH -> per-frame trace."""

    def __init__(self, verts: np.ndarray, tris: np.ndarray, width: int = 512,
                 height: int = 512, mode: str = "auto",
                 brute_threshold: int = 20000):
        self.verts = jnp.asarray(normalize_to_unit_box(verts))
        self.tris = jnp.asarray(tris.astype(np.int32))
        self.width, self.height = width, height
        if mode == "auto":
            mode = "brute" if tris.shape[0] <= brute_threshold else "bvh"
        self.mode = mode
        if mode == "bvh":
            bvh = build_bvh(np.asarray(self.verts), tris)
            self.nodes = jnp.asarray(bvh.nodes)
            self.bvh_tris = jnp.asarray(bvh.tris.astype(np.int32))

    @classmethod
    def from_ply(cls, path, **kw) -> "MeshRenderer":
        verts, tris = load_ply_ascii(path)
        return cls(verts, tris, **kw)

    def render(self, basis: CameraBasis) -> jnp.ndarray:
        ro, rd = camera_rays(basis, self.width, self.height)
        if self.mode == "brute":
            t, n, hit = trace_brute(ro, rd, self.verts, self.tris)
        else:
            t, n, hit = trace_bvh(ro, rd, self.nodes, self.bvh_tris, self.verts)
        return shade(ro, rd, t, n, hit)
