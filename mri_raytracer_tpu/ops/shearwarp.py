"""TPU-native fast BraTS renderer: perspective shear-warp factorization.

Why: per-sample random gathers cost ~14 ns/element on TPU (measured), so the
shader-style marcher (ops/raymarch_xla) is ~5 s/frame at 1024^2 x 256^3. This
module reformulates the identical emission-absorption integral so that ALL
volume access is dense linear algebra on the MXU:

  1. Pick the volume axis most aligned with the view direction (host-side,
     three pre-jitted variants; no recompiles during an orbit).
  2. An "intermediate image" of rays is anchored on the volume face FARTHEST
     from the eye (the base plane). Every intermediate pixel (i, j) defines
     the ray eye -> base-plane grid point. For slice plane k, that ray
     crosses at in-plane position  pos_a(i,k) = off_a(k) + i * sc_a(k)  —
     affine in i with per-slice scale/offset, independent of j (and
     symmetrically for j). Hence per-slice resampling is two SEPARABLE 1-D
     interpolations = two batched matmuls with 2-banded weight matrices
     built on the fly from iota (hat weights for trilinear channels,
     one-hot for nearest/label channels).
  3. Front-to-back compositing runs at intermediate resolution in a
     lax.scan over slices with the exact shader math
     (inr/viewer/brats_rt.slang:115-165): window/level/gamma transfer,
     alpha = 1 - exp(-sigma * dt) with the TRUE per-ray sample spacing
     dt(i,j) = voxel_k * |v|(i,j) / |w0 - e_k|, LUT label overlays
     (pred at 1.5x opacity), per-ray termination at T <= 0.01.
  4. One final 2-D warp (a homography, since all intermediate rays share the
     eye) resamples the composited intermediate to screen pixels.

With ``supersample`` > 1, fractional planes lerp adjacent slices before the
in-plane resample — linear ops commute, so samples are EXACT trilinear
interpolations of the volume at the crossing positions.

Sample positions differ from the uniform-delta-t oracle (plane crossings vs
fixed steps); both discretize the same integral and converge together as the
step shrinks — golden tests assert PSNR against the oracle at matched
effective step sizes.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mri_raytracer_tpu.ops.raymarch_xla import blend_modalities, transfer_function
from mri_raytracer_tpu.render.camera import CameraBasis, camera_rays, unpack_basis
from mri_raytracer_tpu.render.params import BratsRenderParams

_EPS = 1e-6


# --------------------------------------------------------------------- geometry
class SweepGeom(NamedTuple):
    """Per-frame scalars/maps for one sweep axis (all traced arrays).

    The trailing fields support the in-plane CONTENT CROP (the 2-D analog of
    the empty-space k-crop): prepared volumes may be sliced to the occupied
    (a, b) bounding box, with ``a_off``/``b_off`` the global index of the
    crop's first row/column and ``na_g``/``nb_g`` the full (uncropped)
    in-plane dims. Weight builders express the shader's global-box clamp and
    inside-box mask in LOCAL (cropped) index units via these offsets;
    defaults (0 offset, global == local) reproduce the uncropped behavior.
    """

    w_base: jnp.ndarray  # () world coord of the base plane along sweep axis
    e: jnp.ndarray  # (3,) eye, permuted to (k, a, b)
    a0: jnp.ndarray  # () world a-coord of intermediate pixel (i=0)
    b0: jnp.ndarray  # ()
    da: jnp.ndarray  # () intermediate pixel pitch in a
    db: jnp.ndarray  # ()
    flip: jnp.ndarray  # () bool: sweep slices in descending k order
    vmag: jnp.ndarray  # (O, O) |base_point - eye| per intermediate pixel
    dt_map: jnp.ndarray  # (O, O) per-ray spacing between consecutive planes
    a_off: jnp.ndarray = 0.0  # () global index of cropped volume's a row 0
    b_off: jnp.ndarray = 0.0  # ()
    na_g: jnp.ndarray = -1.0  # () global a dim (-1: use the local dim)
    nb_g: jnp.ndarray = -1.0  # ()
    t_entry: jnp.ndarray = -1.0  # (O, O) ray-param of box entry (-1: off)


def _crop_bounds(off_g, n_g, n_local: int):
    """(clamp_lo, clamp_hi_hat, clamp_hi_near, mask_lo, mask_hi) in LOCAL
    index units for a volume cropped at global row ``off_g`` of ``n_g``
    global rows (both traced; n_g < 0 means uncropped)."""
    n = jnp.where(n_g < 0, jnp.float32(n_local), n_g)
    return (-off_g, n - 1.001 - off_g, n - 1.0 - off_g, -off_g, n - off_g)


def _permute3(v: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Reorder an xyz vector so the sweep axis comes first."""
    order = {0: (0, 1, 2), 1: (1, 0, 2), 2: (2, 0, 1)}[axis]
    return jnp.stack([v[order[0]], v[order[1]], v[order[2]]])


def _perm_volume(vol: jnp.ndarray, axis: int) -> jnp.ndarray:
    """(X,Y,Z) -> (K, A, B) with the sweep axis leading."""
    order = {0: (0, 1, 2), 1: (1, 0, 2), 2: (2, 0, 1)}[axis]
    return jnp.transpose(vol, order)


def sweep_geometry(basis: CameraBasis, p: BratsRenderParams,
                   dims_perm: Tuple[int, int, int], axis: int,
                   out_res: int, content_lo=None,
                   content_hi=None,
                   frustum_wh: Optional[Tuple[int, int]] = None) -> SweepGeom:
    """``dims_perm`` are the GLOBAL permuted dims. ``content_lo``/``hi``
    (traced (3,) index-unit bounds, default the full box) define the content
    box whose eye-projection sets the intermediate extent and base plane —
    rays are spent only on the occupied region (exact whenever voxels outside
    the content box are empty and transfer(0) == 0).

    ``frustum_wh`` (static (width, height)): bound the intermediate extent by
    the SCREEN FRUSTUM's footprint on the base plane intersected with the
    content projection. Without it the content projection is clamped to a
    fixed multiple of the box — which CUTS real content at near-diagonal
    views (near-plane content legitimately projects up to ~3.4x the box
    from the eye; the clamp produced a black wedge of missing content worth
    ~8 dB at the worst pose). Rays outside the screen never matter, so the
    frustum bbox is the principled bound."""
    Nk, Na, Nb = dims_perm
    bmin = _permute3(p.vol_min, axis)
    vox = _permute3(p.voxel_size, axis)
    e = _permute3(basis.eye, axis)
    dimsf = jnp.array([Nk, Na, Nb], jnp.float32)
    c_lo = jnp.zeros(3, jnp.float32) if content_lo is None \
        else jnp.asarray(content_lo, jnp.float32)
    c_hi = dimsf if content_hi is None else jnp.asarray(content_hi, jnp.float32)

    # Base plane: the content k-face farthest from the eye.
    w_lo = bmin[0] + vox[0] * c_lo[0]
    w_hi = bmin[0] + vox[0] * c_hi[0]
    use_hi = jnp.abs(w_hi - e[0]) > jnp.abs(w_lo - e[0])
    w_base = jnp.where(use_hi, w_hi, w_lo)

    # Intermediate extent: projections of the 8 content-box corners from the
    # eye onto the base plane (the corner hull contains every content
    # point's projection by convexity — the eye is outside the k-slab for
    # any orbit pose, so no corner projects through infinity).
    ca = bmin[1] + vox[1] * jnp.array([c_lo[1], c_hi[1]])
    cb = bmin[2] + vox[2] * jnp.array([c_lo[2], c_hi[2]])
    ck = jnp.array([w_lo, w_hi])
    K, A, B = jnp.meshgrid(ck, ca, cb, indexing="ij")
    denom = K.reshape(-1) - e[0]
    denom = jnp.where(jnp.abs(denom) < _EPS, _EPS, denom)
    lam = (w_base - e[0]) / denom
    lam = jnp.clip(lam, 0.0, 64.0)  # numeric guard (eye-in-slab degeneracy)
    proj_a = e[1] + lam * (A.reshape(-1) - e[1])
    proj_b = e[2] + lam * (B.reshape(-1) - e[2])
    size_a = ca[1] - ca[0]
    size_b = cb[1] - cb[0]
    amin = jnp.min(proj_a)
    amax = jnp.max(proj_a)
    bmin2 = jnp.min(proj_b)
    bmax2 = jnp.max(proj_b)
    if frustum_wh is not None:
        # Screen footprint on the base plane: the 4 corner-pixel-center
        # rays (projective maps carry the screen rectangle to a quad whose
        # bbox the corner hits bound). Valid only when every corner ray
        # crosses the base plane forward (t > 0) — degenerate poses fall
        # back to the content-only extent below.
        W, H = frustum_wh
        f = 1.0 / jnp.tan(0.5 * basis.fov_y)
        aspect = W / max(1.0, float(H))
        ux = (0.5 / W) * 2.0 - 1.0  # outermost pixel-center NDC
        vy = (0.5 / H) * 2.0 - 1.0
        hits_a, hits_b, ts = [], [], []
        for sx in (ux, -ux):
            for sy in (vy, -vy):
                d = (sx * aspect / f) * basis.right \
                    + (-sy / f) * basis.up + basis.forward
                dp = _permute3(d, axis)
                dk = jnp.where(jnp.abs(dp[0]) < _EPS, _EPS, dp[0])
                t = (w_base - e[0]) / dk
                ts.append(t)
                hits_a.append(e[1] + t * dp[1])
                hits_b.append(e[2] + t * dp[2])
        ok = jnp.stack(ts).min() > 0.0
        fa = jnp.stack(hits_a)
        fb = jnp.stack(hits_b)
        # 1% margin: the screen edge rays sit half a pixel beyond the
        # corner centers and the warp's bilinear needs one source pixel.
        pad_a = 0.01 * (fa.max() - fa.min())
        pad_b = 0.01 * (fb.max() - fb.min())
        amin = jnp.where(ok, jnp.maximum(amin, fa.min() - pad_a), amin)
        amax = jnp.where(ok, jnp.minimum(amax, fa.max() + pad_a), amax)
        bmin2 = jnp.where(ok, jnp.maximum(bmin2, fb.min() - pad_b), bmin2)
        bmax2 = jnp.where(ok, jnp.minimum(bmax2, fb.max() + pad_b), bmax2)
    # Wide numeric guard (replaces the old 3x-box clamp that cut content):
    # 8x the content box on either side keeps degenerate poses finite.
    amin = jnp.clip(amin, ca[0] - 8.0 * size_a, ca[1] + 8.0 * size_a)
    amax = jnp.clip(amax, ca[0] - 8.0 * size_a, ca[1] + 8.0 * size_a)
    bmin2 = jnp.clip(bmin2, cb[0] - 8.0 * size_b, cb[1] + 8.0 * size_b)
    bmax2 = jnp.clip(bmax2, cb[0] - 8.0 * size_b, cb[1] + 8.0 * size_b)
    da = jnp.maximum(amax - amin, _EPS) / (out_res - 1)
    db = jnp.maximum(bmax2 - bmin2, _EPS) / (out_res - 1)

    ii = jnp.arange(out_res, dtype=jnp.float32)
    va = (amin + ii * da) - e[1]  # (O,)
    vb = (bmin2 + ii * db) - e[2]
    vk = w_base - e[0]
    vmag = jnp.sqrt(va[:, None] ** 2 + vb[None, :] ** 2 + vk ** 2)
    dt_map = vox[0] * vmag / jnp.maximum(jnp.abs(vk), _EPS)

    # Ray parameter (arc length from the eye) of entry into the compositing
    # box: k spans the CONTENT range (the only planes that exist), (a, b)
    # span the GLOBAL box (the inplane masks' domain). The compositors
    # extend the FIRST crossing's dt by the entry->crossing distance so the
    # entry segment's emission is not lost (the shader's first sample sits
    # exactly at box entry, brats_rt.slang:115-125); without it, diagonal
    # views lose up to one plane spacing of emission at every silhouette
    # ray (measured ~12 dB PSNR at the worst pose, docs/RESULTS_r2.md).
    d_k = jnp.where(jnp.abs(vk) < _EPS, _EPS, vk)
    d_a = jnp.where(jnp.abs(va) < _EPS, _EPS, va)
    d_b = jnp.where(jnp.abs(vb) < _EPS, _EPS, vb)
    a_lo_w = bmin[1]
    a_hi_w = bmin[1] + vox[1] * dimsf[1]
    b_lo_w = bmin[2]
    b_hi_w = bmin[2] + vox[2] * dimsf[2]
    s_k = jnp.minimum((w_lo - e[0]) / d_k, (w_hi - e[0]) / d_k)  # ()
    s_a = jnp.minimum((a_lo_w - e[1]) / d_a, (a_hi_w - e[1]) / d_a)  # (O,)
    s_b = jnp.minimum((b_lo_w - e[2]) / d_b, (b_hi_w - e[2]) / d_b)  # (O,)
    s_in = jnp.maximum(s_k, jnp.maximum(s_a[:, None], s_b[None, :]))
    t_entry = jnp.maximum(s_in, 0.0) * vmag

    flip = (vox[0] / jnp.where(jnp.abs(vk) < _EPS, _EPS, vk)) < 0.0
    return SweepGeom(w_base=w_base, e=e, a0=amin, b0=bmin2, da=da, db=db,
                     flip=flip, vmag=vmag, dt_map=dt_map,
                     a_off=c_lo[1], b_off=c_lo[2],
                     na_g=jnp.float32(Na), nb_g=jnp.float32(Nb),
                     t_entry=t_entry)


# ------------------------------------------------------------ weight matrices
def _inplane_affine(geom: SweepGeom, in_axis: int, bmin_a, vox_a, w_k):
    """Scale/offset of the crossing position (LOCAL index units of the
    possibly-cropped volume) along in-plane axis ``in_axis`` (0 = a, 1 = b)
    for the slice plane at world ``w_k``: pos(i) = off + i * sc."""
    e_in = geom.e[1 + in_axis]
    g0 = geom.a0 if in_axis == 0 else geom.b0
    dg = geom.da if in_axis == 0 else geom.db
    off_g = geom.a_off if in_axis == 0 else geom.b_off
    lam = (w_k - geom.e[0]) / (geom.w_base - geom.e[0])
    off = (e_in * (1.0 - lam) + lam * g0 - bmin_a) / vox_a - off_g
    sc = lam * dg / vox_a
    return off, sc, lam


def sweep_plane_affines(geom: SweepGeom, p, axis: int, n_planes: int,
                        z_offset=None):
    """Per-plane sweep affines for ALL ``n_planes`` planes in SWEEP order
    (flip applied): returns (z local slice index, z_glob, lam, off_a, sc_a,
    off_b, sc_b), each (n_planes,). Single source of truth for the
    crop/slab contract shared by the fused Pallas compositing kernel and
    the neural-march prediction field — the field is composited by the
    kernel, so the two MUST agree bit-exactly."""
    bmin = _permute3(p.vol_min, axis)
    vox = _permute3(p.voxel_size, axis)
    z_off = jnp.float32(0.0) if z_offset is None else \
        jnp.asarray(z_offset, jnp.float32)
    m = jnp.arange(n_planes, dtype=jnp.float32)
    z = jnp.where(geom.flip, (n_planes - 1) - m, m)  # local slice index
    z_glob = z + z_off
    w_k = bmin[0] + z_glob * vox[0]
    off_a, sc_a, lam = _inplane_affine(geom, 0, bmin[1], vox[1], w_k)
    off_b, sc_b, _ = _inplane_affine(geom, 1, bmin[2], vox[2], w_k)
    return z, z_glob, lam, off_a, sc_a, off_b, sc_b


def hat_matrix(off, sc, n_in: int, out_res: int, clamp_lo=0.0, clamp_hi=None,
               mask_lo=0.0, mask_hi=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(O, N) trilinear hat weights + (O,) inside-box mask for positions
    pos(i) = off + i*sc. Positions clamp to [clamp_lo, clamp_hi] — the
    shader sampler's global-box clamp, default [0, n_in - 1.001] — and the
    mask marks pos in [mask_lo, mask_hi] (default [0, n_in], the full box).
    For CROPPED volumes the bounds are the global ones shifted into local
    units; positions outside [-1, n_in] then get all-zero rows, the natural
    trilinear weight of a sample whose support voxels are absent (= empty)."""
    clamp_hi = n_in - 1.001 if clamp_hi is None else clamp_hi
    mask_hi = float(n_in) if mask_hi is None else mask_hi
    i = jnp.arange(out_res, dtype=jnp.float32)
    pos = off + i * sc  # (O,)
    inside = (pos >= mask_lo) & (pos <= mask_hi)
    q = jnp.clip(pos, clamp_lo, clamp_hi)
    base = jnp.floor(q)
    frac = q - base
    y = jnp.arange(n_in, dtype=jnp.float32)
    d0 = y[None, :] - base[:, None]  # 0 at floor, 1 at floor+1
    w = jnp.where(d0 == 0.0, 1.0 - frac[:, None],
                  jnp.where(d0 == 1.0, frac[:, None], 0.0))
    return w, inside.astype(jnp.float32)


def nearest_matrix(off, sc, n_in: int, out_res: int, clamp_lo=0.0,
                   clamp_hi=None) -> jnp.ndarray:
    """(O, N) one-hot nearest weights (label channels): round(clamp(pos));
    out-of-crop positions match no row (label 0 = empty, exact)."""
    clamp_hi = float(n_in - 1) if clamp_hi is None else clamp_hi
    i = jnp.arange(out_res, dtype=jnp.float32)
    pos = off + i * sc
    q = jnp.round(jnp.clip(pos, clamp_lo, clamp_hi))
    y = jnp.arange(n_in, dtype=jnp.float32)
    return (y[None, :] == q[:, None]).astype(jnp.float32)


def entry_ratio_map(geom: SweepGeom, near, dt_plane) -> jnp.ndarray:
    """Per-pixel r = max(t_entry, near) / dt: the march start position in
    plane-spacing units. With q = t_k/dt (a per-plane SCALAR — vmag cancels),
    the first crossing at or after the start satisfies 0 <= q - r < 1; the
    compositors extend that plane's dt by (q - r) * dt so the entry
    segment's emission is integrated. Sentinel t_entry < 0 disables."""
    t_start = jnp.maximum(geom.t_entry, near)
    return jnp.where(jnp.asarray(geom.t_entry) < 0.0, jnp.float32(3e38),
                     t_start / jnp.maximum(dt_plane, _EPS))


def entry_active(g: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """Pre-entry gate: planes before the march start (g < 0) never
    composite. The sentinel r >= 1e37 (t_entry disabled) passes everything.
    Gating on the SAME g = q - r that drives the first-segment correction
    (rather than only the lateral inplane mask) keeps plane activation and
    the correction consistent. The -1e-3 tolerance is essential: rays
    entering through a k-face hit the entry plane at g = 0 EXACTLY, so a
    hard g >= 0 would cull the whole first plane for half the image
    depending on fp rounding (the correction clips negative g to 0, so
    tolerated planes get scale 1 — the shader's entry-sample semantic)."""
    return (g >= -1e-3) | (r >= 1e37)


def entry_correction(g, act, started):
    """First-active-plane dt scale + updated per-ray 'started' mask.

    The FIRST active plane along each ray extends its dt by the
    entry->crossing distance g = q - r, clipped to [0, 2] (g >= 2 means a
    continuation slab: no correction). Tracking 'first active' per ray —
    instead of the stateless 0 <= g < 1 plane test — makes the integrated
    march length CONTINUOUS in r: if fp noise flips a boundary plane's
    activity, the correction moves to the next plane with g larger by
    exactly the dropped plane's spacing, so total length is preserved
    (the stateless form jumps the first plane's dt between 1x and 2x,
    a ~0.2 color discontinuity at box-silhouette pixels).
    """
    first = act * (1.0 - started)
    scale = 1.0 + jnp.clip(g, 0.0, 2.0) * (g < 2.0).astype(jnp.float32) \
        * first
    return scale, jnp.maximum(started, act)


def _geom_bounds(geom: SweepGeom, in_axis: int, n_local: int):
    """Weight-builder bounds for in-plane axis 0 (a) or 1 (b)."""
    off_g = geom.a_off if in_axis == 0 else geom.b_off
    n_g = geom.na_g if in_axis == 0 else geom.nb_g
    return _crop_bounds(off_g, n_g, n_local)


def _lut_rgba(lab: jnp.ndarray, lut: jnp.ndarray) -> jnp.ndarray:
    """(O,O) float label (exact small ints) -> (O,O,4) via 8-way select;
    labels outside [1,8) resolve to the transparent lut[0]."""
    idx = jnp.round(lab).astype(jnp.int32)
    idx = jnp.where((idx > 0) & (idx < 8), idx, 0)
    out = jnp.zeros(lab.shape + (4,), jnp.float32)
    for c in range(1, 8):
        out = jnp.where((idx == c)[..., None], lut[c], out)
    return out



def _nearest_resample(vol_s, zn, Wan, Wbn):
    """One-hot (nearest) separable resample of an integer label slice.
    bf16 is exact here: one-hot weights and label values 0..7 are
    representable, so the picked label survives the matmul unchanged."""
    sl = jax.lax.dynamic_index_in_dim(vol_s, zn, 0, False).astype(jnp.bfloat16)
    t = jnp.dot(Wan.astype(jnp.bfloat16), sl, preferred_element_type=jnp.float32)
    return jnp.dot(t.astype(jnp.bfloat16), Wbn.T.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)


# ------------------------------------------------------------------ the sweep
def _composite(C, T, rgb, alpha):
    C = C + (alpha * T)[..., None] * rgb
    T = T * (1.0 - alpha)
    return C, T


def sweep_composite(mixed_s: jnp.ndarray, seg_s: Optional[jnp.ndarray],
                    pred_s: Optional[jnp.ndarray], geom: SweepGeom,
                    p: BratsRenderParams, axis: int, out_res: int,
                    supersample: int = 1, use_gamma: bool = True,
                    use_clip: bool = True,
                    out_cols: Optional[int] = None,
                    z_offset=None, nk_global: Optional[int] = None,
                    term_gate: bool = True,
                    remat: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Scan over slice planes; returns intermediate (O,O,3) emission and
    (O,O) transmittance. Volumes are pre-permuted to (K, A, B).

    The whole sweep is differentiable (hat-matrix resampling is linear in
    the volume; the transfer function is smooth), so ``jax.grad`` through
    this compositor trains against images from the FAST renderer
    (reference ``docs/Goals.md:36-39``). ``remat=True`` wraps the plane
    body in ``jax.checkpoint`` so the backward pass rematerializes each
    plane's resample instead of storing n_planes activation sets — backward
    memory drops to O(out_res^2) regardless of volume depth (the
    training-path default; forward-only rendering keeps remat=False).

    Slab mode (volume sharding, parallel/render.py): ``mixed_s`` holds a
    k-contiguous SLAB of a larger volume; ``z_offset`` (traced scalar) is
    the slab's first global slice index and ``nk_global`` the full volume
    depth. The slab composites its own planes only (the closing plane
    z = nk_global is composited by whichever slab owns the volume end) and
    ``term_gate=False`` disables the T<=0.01 early-out so cross-slab
    composition stays EXACT (the gate needs upstream transmittance, which
    another device owns).
    """
    Nk, Na, Nb = mixed_s.shape
    # ``out_cols`` < out_res composites only a column stripe of the
    # intermediate (spatial sharding: geom must carry pre-sliced
    # vmag/dt_map and a b0 shifted by j0*db — see parallel/render.py).
    cols = out_cols or out_res
    bmin = _permute3(p.vol_min, axis)
    vox = _permute3(p.voxel_size, axis)
    slab_mode = z_offset is not None
    nk_g = nk_global if nk_global is not None else Nk
    z_off = jnp.float32(0.0) if z_offset is None else \
        jnp.asarray(z_offset, jnp.float32)
    # Planes cover the FULL box depth, index z in [0, Nk] (the box spans
    # [vol_min, vol_min + voxel*dims] = index [0, N]; samples in the outer
    # [N-1, N] margin clamp to the edge slice exactly like the shader).
    n_planes = Nk * supersample + 1
    dt = geom.dt_map / supersample

    near_t = jnp.maximum(p.near, 0.0)
    tmin_map = near_t * jnp.ones_like(geom.vmag)
    big = jnp.float32(3e38)
    tmax_map = jnp.where(p.far > 0.0, p.far, big) * jnp.ones_like(geom.vmag)
    # First-segment dt correction: q = t_k/dt is a per-plane scalar
    # (lam * qfac); the plane with 0 <= q - r < 1 is the first crossing at
    # or after the march start and its dt extends by (q - r) * dt.
    qfac = jnp.abs(geom.w_base - geom.e[0]) * supersample \
        / jnp.maximum(_permute3(p.voxel_size, axis)[0], _EPS)
    r_map = entry_ratio_map(geom, near_t, dt)

    def body(carry, m):
        C, T, started = carry
        # Plane index along the sweep (flip for back-to-front eyes).
        mm = jnp.where(geom.flip, n_planes - 1 - m, m)
        z = mm.astype(jnp.float32) / supersample  # local fractional index
        # Value sampling clamps to [0, Nk - 1.001] (shader clamp); the plane's
        # world position w_k keeps the UNclamped z.
        zq = jnp.clip(z, 0.0, Nk - 1.001)
        z0 = jnp.floor(zq).astype(jnp.int32)
        fz = zq - z0.astype(jnp.float32)
        z1 = jnp.minimum(z0 + 1, Nk - 1)

        z_glob = z + z_off
        w_k = bmin[0] + z_glob * vox[0]
        off_a, sc_a, lam = _inplane_affine(geom, 0, bmin[1], vox[1], w_k)
        off_b, sc_b, _ = _inplane_affine(geom, 1, bmin[2], vox[2], w_k)
        acl, ach, acn, aml, amh = _geom_bounds(geom, 0, Na)
        bcl, bch, bcn, bml, bmh = _geom_bounds(geom, 1, Nb)
        Wa, mask_a = hat_matrix(off_a, sc_a, Na, out_res, acl, ach, aml, amh)
        Wb, mask_b = hat_matrix(off_b, sc_b, Nb, cols, bcl, bch, bml, bmh)

        # z-lerp the two bracketing slices, then separable in-plane resample
        # (linear ops commute => exact trilinear at the crossing position).
        # Matmuls run in bf16 with f32 accumulation: weights are exact in
        # bf16 up to rounding of frac, volume values are display-normalized
        # [0,1] — sample error ~2e-3, well under the compositing tolerance.
        sl = ((1.0 - fz) * jax.lax.dynamic_index_in_dim(mixed_s, z0, 0, False)
              + fz * jax.lax.dynamic_index_in_dim(mixed_s, z1, 0, False))
        t1 = jnp.dot(Wa.astype(jnp.bfloat16), sl.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
        v = jnp.dot(t1.astype(jnp.bfloat16), Wb.T.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)  # (O, O)

        # Ray parameter of this crossing + activity mask.
        inplane = mask_a[:, None] * mask_b[None, :]
        gate = (T > 0.01) if term_gate else jnp.bool_(True)
        g = lam * qfac - r_map
        if use_clip:
            t_k = lam * geom.vmag
            active = (inplane > 0.0) & (t_k >= tmin_map) & (t_k <= tmax_map) \
                & gate
        else:
            # near/far both disabled: behind-eye planes have lam < 0, a
            # per-plane scalar test — skips the per-pixel t map entirely.
            active = (inplane > 0.0) & (lam >= 0.0) & gate
        active = active & entry_active(g, r_map)
        if slab_mode:
            # Slab owns planes [0, Nk) plus the closing plane only when it
            # holds the volume end (avoids double-compositing the plane
            # shared with the next slab).
            own = jnp.where(z < Nk - 1e-6, True, z_glob >= nk_g - 1e-6)
            active = active & own
        act = active.astype(jnp.float32)

        scale, started = entry_correction(g, act, started)
        dt_e = dt * scale
        val = jnp.clip((v - (p.wl - p.ww * 0.5)) / p.ww, 0.0, 1.0)
        if use_gamma:
            val = jnp.power(val, p.gamma)
        a = (1.0 - jnp.exp(-val * p.intensity_alpha * dt_e)) * act
        C, T = _composite(C, T, val[..., None], a)

        if seg_s is not None:
            Wan = nearest_matrix(off_a, sc_a, Na, out_res, acl, acn)
            Wbn = nearest_matrix(off_b, sc_b, Nb, cols, bcl, bcn)
            zn = jnp.clip(jnp.round(z).astype(jnp.int32), 0, Nk - 1)
            lab = _nearest_resample(seg_s, zn, Wan, Wbn)
            rgba = _lut_rgba(lab, p.lut)
            a = (1.0 - jnp.exp(-rgba[..., 3] * dt_e)) * act * \
                jnp.where(p.show_seg > 0, 1.0, 0.0)
            C, T = _composite(C, T, rgba[..., :3], a)
            if pred_s is not None:
                labp = _nearest_resample(pred_s, zn, Wan, Wbn)
                rgba = _lut_rgba(labp, p.lut)
                a = (1.0 - jnp.exp(-rgba[..., 3] * dt_e * 1.5)) * act * \
                    jnp.where(p.show_pred > 0, 1.0, 0.0)
                C, T = _composite(C, T, rgba[..., :3], a)
        elif pred_s is not None:
            Wan = nearest_matrix(off_a, sc_a, Na, out_res, acl, acn)
            Wbn = nearest_matrix(off_b, sc_b, Nb, cols, bcl, bcn)
            zn = jnp.clip(jnp.round(z).astype(jnp.int32), 0, Nk - 1)
            labp = _nearest_resample(pred_s, zn, Wan, Wbn)
            rgba = _lut_rgba(labp, p.lut)
            a = (1.0 - jnp.exp(-rgba[..., 3] * dt_e * 1.5)) * act * \
                jnp.where(p.show_pred > 0, 1.0, 0.0)
            C, T = _composite(C, T, rgba[..., :3], a)

        return (C, T, started), None

    C0 = jnp.zeros((out_res, cols, 3), jnp.float32)
    T0 = jnp.ones((out_res, cols), jnp.float32)
    S0 = jnp.zeros((out_res, cols), jnp.float32)
    # unroll=2 lets XLA fuse adjacent planes' compositing chains, halving
    # C/T HBM round-trips (measured ~20% frame win; higher unrolls regress).
    scan_body = jax.checkpoint(body) if remat else body
    (C, T, _), _ = jax.lax.scan(scan_body, (C0, T0, S0),
                                jnp.arange(n_planes),
                                unroll=1 if remat else 2)
    return C, T


def _batched_hat(offs, scs, n_in: int, out_res: int, clamp_lo=0.0,
                 clamp_hi=None, mask_lo=0.0, mask_hi=None):
    """(S,O,N) hat weights + (S,O) inside mask for a slab of planes."""
    clamp_hi = n_in - 1.001 if clamp_hi is None else clamp_hi
    mask_hi = float(n_in) if mask_hi is None else mask_hi
    i = jnp.arange(out_res, dtype=jnp.float32)
    pos = offs[:, None] + i[None, :] * scs[:, None]  # (S, O)
    inside = ((pos >= mask_lo) & (pos <= mask_hi)).astype(jnp.float32)
    q = jnp.clip(pos, clamp_lo, clamp_hi)
    base = jnp.floor(q)
    frac = q - base
    y = jnp.arange(n_in, dtype=jnp.float32)
    d0 = y[None, None, :] - base[..., None]
    w = jnp.where(d0 == 0.0, 1.0 - frac[..., None],
                  jnp.where(d0 == 1.0, frac[..., None], 0.0))
    return w, inside


def _batched_nearest(offs, scs, n_in: int, out_res: int, clamp_lo=0.0,
                     clamp_hi=None):
    clamp_hi = float(n_in - 1) if clamp_hi is None else clamp_hi
    i = jnp.arange(out_res, dtype=jnp.float32)
    pos = offs[:, None] + i[None, :] * scs[:, None]
    q = jnp.round(jnp.clip(pos, clamp_lo, clamp_hi))
    y = jnp.arange(n_in, dtype=jnp.float32)
    return (y[None, None, :] == q[..., None]).astype(jnp.float32)


def _bf16_resample(block, Wa, Wb):
    """(S,N,N) slices x (S,O,N)/(S,O,N) weights -> (S,O,O), bf16 on the MXU
    with f32 accumulation."""
    t = jnp.einsum("soy,syx->sox", Wa.astype(jnp.bfloat16),
                   block.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)
    return jnp.einsum("sox,spx->sop", t.astype(jnp.bfloat16),
                      Wb.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)


def sweep_composite_slab(mixed_s: jnp.ndarray, seg_s: Optional[jnp.ndarray],
                         pred_s: Optional[jnp.ndarray], geom: SweepGeom,
                         p: BratsRenderParams, axis: int, out_res: int,
                         slab: int = 16) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Slab-batched compositing for supersample == 1 (the fast path).

    Resampling runs as two big batched bf16 einsums per slab (high MXU
    utilization vs a 257-iteration scan of tiny matmuls); the three overlay
    composites at one plane fold into a single per-plane net emission
    E = aI*val + (1-aI)*aS*segRGB + (1-aI)(1-aS)*aP*predRGB and net
    transmittance factor tau = (1-aI)(1-aS)(1-aP); across planes a cumulative
    product replaces the sequential recurrence. The T<=0.01 termination gate
    applies to each plane's *entry* transmittance, which is monotone, so the
    gating matches the sequential oracle exactly.
    """
    Nk, Na, Nb = mixed_s.shape
    bmin = _permute3(p.vol_min, axis)
    vox = _permute3(p.voxel_size, axis)
    n_planes = Nk + 1  # index z in [0, Nk]; z = Nk clamps to the edge slice
    pad = (-n_planes) % slab
    n_slabs = (n_planes + pad) // slab

    def _pad(v):
        # ``slab`` edge copies on each end: every slab's contiguous block
        # (including partial/overhanging ones) reads valid memory, and the
        # z = Nk plane sees the clamped edge slice. Overhang planes are
        # masked out via ``in_range``.
        return jnp.concatenate([jnp.repeat(v[:1], slab, 0), v,
                                jnp.repeat(v[-1:], slab + 1, 0)], axis=0)

    padded = _pad(mixed_s)
    seg_p = _pad(seg_s) if seg_s is not None else None
    pred_p = _pad(pred_s) if pred_s is not None else None

    near_t = jnp.maximum(p.near, 0.0)
    far_t = jnp.where(p.far > 0.0, p.far, jnp.float32(3e38))
    dt = geom.dt_map
    show_seg = jnp.where(p.show_seg > 0, 1.0, 0.0)
    show_pred = jnp.where(p.show_pred > 0, 1.0, 0.0)
    qfac = jnp.abs(geom.w_base - geom.e[0]) / jnp.maximum(vox[0], 1e-6)
    r_map = entry_ratio_map(geom, near_t, dt)

    def slab_body(carry, s_idx):
        C, T, started = carry
        m0 = s_idx * slab
        m = m0 + jnp.arange(slab)  # plane ids within the sweep order
        mm = jnp.where(geom.flip, n_planes - 1 - m, m)  # slice index z
        in_range = (m < n_planes).astype(jnp.float32)  # padding mask
        z = mm.astype(jnp.float32)

        # Contiguous slice block (reversed when sweeping back-to-front);
        # the +slab offset lands inside the edge padding for overhangs.
        start = jnp.where(geom.flip, mm[-1], mm[0]) + slab
        block = jax.lax.dynamic_slice_in_dim(padded, start, slab, 0)
        block = jnp.where(geom.flip, jnp.flip(block, 0), block)

        w_k = bmin[0] + z * vox[0]
        lam = (w_k - geom.e[0]) / (geom.w_base - geom.e[0])
        off_a = (geom.e[1] * (1.0 - lam) + lam * geom.a0 - bmin[1]) / vox[1] \
            - geom.a_off
        sc_a = lam * geom.da / vox[1]
        off_b = (geom.e[2] * (1.0 - lam) + lam * geom.b0 - bmin[2]) / vox[2] \
            - geom.b_off
        sc_b = lam * geom.db / vox[2]

        acl, ach, acn, aml, amh = _geom_bounds(geom, 0, Na)
        bcl, bch, bcn, bml, bmh = _geom_bounds(geom, 1, Nb)
        Wa, mask_a = _batched_hat(off_a, sc_a, Na, out_res, acl, ach, aml, amh)
        Wb, mask_b = _batched_hat(off_b, sc_b, Nb, out_res, bcl, bch, bml, bmh)
        v = _bf16_resample(block, Wa, Wb)  # (S, O, O)

        t_k = lam[:, None, None] * geom.vmag[None]  # (S, O, O)
        g = lam[:, None, None] * qfac - r_map[None]  # (S, O, O)
        act = (mask_a[:, :, None] * mask_b[:, None, :]
               * (t_k >= near_t) * (t_k <= far_t)
               * in_range[:, None, None]
               * entry_active(g, r_map[None]).astype(jnp.float32))

        # First active plane per ray across the whole sweep: exclusive
        # running-OR of act within the slab, seeded by the carried mask.
        prev_any = jnp.maximum((jnp.cumsum(act, axis=0) - act > 0.0)
                               .astype(jnp.float32), started[None])
        first = act * (1.0 - prev_any)
        dt_e = dt[None] * (1.0 + jnp.clip(g, 0.0, 2.0)
                           * (g < 2.0).astype(jnp.float32) * first)
        started = jnp.maximum(started, jnp.max(act, axis=0))
        val = transfer_function(v, p.ww, p.wl, p.gamma)
        aI = (1.0 - jnp.exp(-val * p.intensity_alpha * dt_e)) * act
        E = aI[..., None] * val[..., None]  # (S, O, O, 3) grayscale emission
        tau = 1.0 - aI

        if seg_s is not None or pred_s is not None:
            Wan = _batched_nearest(off_a, sc_a, Na, out_res, acl, acn)
            Wbn = _batched_nearest(off_b, sc_b, Nb, out_res, bcl, bcn)
        if seg_s is not None:
            seg_blk = jax.lax.dynamic_slice_in_dim(seg_p, start, slab, 0)
            seg_blk = jnp.where(geom.flip, jnp.flip(seg_blk, 0), seg_blk)
            lab = _bf16_resample(seg_blk.astype(jnp.float32), Wan, Wbn)
            rgba = _lut_rgba(lab, p.lut)
            aS = (1.0 - jnp.exp(-rgba[..., 3] * dt_e)) * act * show_seg
            E = E + (tau * aS)[..., None] * rgba[..., :3]
            tau = tau * (1.0 - aS)
        if pred_s is not None:
            pred_blk = jax.lax.dynamic_slice_in_dim(pred_p, start, slab, 0)
            pred_blk = jnp.where(geom.flip, jnp.flip(pred_blk, 0), pred_blk)
            labp = _bf16_resample(pred_blk.astype(jnp.float32), Wan, Wbn)
            rgba = _lut_rgba(labp, p.lut)
            aP = (1.0 - jnp.exp(-rgba[..., 3] * dt_e * 1.5)) * act * show_pred
            E = E + (tau * aP)[..., None] * rgba[..., :3]
            tau = tau * (1.0 - aP)

        # Exclusive cumulative transmittance within the slab, then gate each
        # plane's contribution by its entry transmittance (> 0.01).
        cum = jnp.cumprod(tau, axis=0)
        cum_excl = jnp.concatenate([jnp.ones_like(cum[:1]), cum[:-1]], axis=0)
        T_entry = T[None] * cum_excl  # (S, O, O)
        gate = (T_entry > 0.01).astype(jnp.float32)
        C = C + jnp.sum((T_entry * gate)[..., None] * E, axis=0)
        T = T * cum[-1]
        return (C, T, started), None

    C0 = jnp.zeros((out_res, out_res, 3), jnp.float32)
    T0 = jnp.ones((out_res, out_res), jnp.float32)
    S0 = jnp.zeros((out_res, out_res), jnp.float32)
    (C, T, _), _ = jax.lax.scan(slab_body, (C0, T0, S0), jnp.arange(n_slabs))
    return C, T


# ---------------------------------------------------------------- final warp
def warp_to_screen(C: jnp.ndarray, geom: SweepGeom, basis: CameraBasis,
                   axis: int, width: int, height: int,
                   bg: jnp.ndarray, use_pallas: bool = False,
                   win: Optional[Tuple[int, int]] = None) -> jnp.ndarray:
    """Homography warp intermediate -> screen.

    Screen pixel ray (unit d, permuted): hits the base plane at
    t = (w_base - e_k)/d_k; in-plane coords -> intermediate (i, j).
    Two implementations: a row-gather bilinear (portable) and a Pallas
    tile-matmul kernel (ops/pallas_warp) selected on TPU whenever every
    tile's source footprint fits the kernel window (lax.cond at runtime).
    ``win``: static kernel-window variant (see pallas_warp.WINDOW_LADDER);
    None = the ladder max.

    The maps are computed from UNNORMALIZED camera directions — the ray
    normalization cancels in ``e + t_base * d`` (t_base carries 1/|d|), so
    the prelude is a ratio of functions affine in pixel NDC instead of the
    full camera_rays path (normalize + (H, W, 3) stacks); same homography,
    ~1 ms cheaper at 1024^2 over the tunnel.
    """
    O = C.shape[0]
    order = {0: (0, 1, 2), 1: (1, 0, 2), 2: (2, 0, 1)}[axis]
    f = 1.0 / jnp.tan(0.5 * basis.fov_y)
    aspect = width / max(1.0, float(height))
    xs = (jnp.arange(width, dtype=jnp.float32) + 0.5) / width * 2.0 - 1.0
    ys = (jnp.arange(height, dtype=jnp.float32) + 0.5) / height * 2.0 - 1.0
    cx = (xs * aspect / f)[None, :]  # (1, W)
    cy = (-ys / f)[:, None]  # (H, 1)
    R = _permute3(basis.right, axis)
    U = _permute3(basis.up, axis)
    F = _permute3(basis.forward, axis)
    e = geom.e
    dk = cx * R[0] + cy * U[0] + F[0]  # (H, W) unnormalized
    da_ = cx * R[1] + cy * U[1] + F[1]
    db_ = cx * R[2] + cy * U[2] + F[2]
    denom = jnp.where(jnp.abs(dk) < _EPS, _EPS, dk)
    t_base = (geom.w_base - e[0]) / denom
    hit_a = e[1] + t_base * da_
    hit_b = e[2] + t_base * db_
    i_map = (hit_a - geom.a0) / geom.da
    j_map = (hit_b - geom.b0) / geom.db
    valid = (t_base > 0.0) & (i_map >= 0.0) & (i_map <= O - 1) & \
            (j_map >= 0.0) & (j_map <= O - 1)
    # Clamp BEFORE warping: invalid pixels (masked to bg below) otherwise
    # blow up per-tile source footprints (grazing rays hit the base plane
    # kilometers out) and force the Pallas warp's fit check to fail.
    i_map = jnp.clip(i_map, 0.0, O - 1.0)
    j_map = jnp.clip(j_map, 0.0, O - 1.0)

    def gather_warp(C, i_map, j_map):
        # ONE row-gather per output pixel: pre-concat the 4 bilinear
        # corners' RGB into 12-float rows (a wide-row take measures ~3x
        # faster than four separate 3-float takes on TPU).
        i0 = jnp.clip(jnp.floor(i_map).astype(jnp.int32), 0, O - 2)
        j0 = jnp.clip(jnp.floor(j_map).astype(jnp.int32), 0, O - 2)
        fi = jnp.clip(i_map - i0, 0.0, 1.0)
        fj = jnp.clip(j_map - j0, 0.0, 1.0)
        C2 = jnp.concatenate([C[:, :-1], C[:, 1:]], axis=-1)  # (O, O-1, 6)
        C4 = jnp.concatenate([C2[:-1], C2[1:]], axis=-1)  # (O-1, O-1, 12)
        quad = jnp.take(C4.reshape((O - 1) * (O - 1), 12),
                        (i0 * (O - 1) + j0).reshape(-1), axis=0)
        quad = quad.reshape(height, width, 4, 3)
        w00 = ((1 - fi) * (1 - fj))[..., None]
        w01 = ((1 - fi) * fj)[..., None]
        w10 = (fi * (1 - fj))[..., None]
        w11 = (fi * fj)[..., None]
        return (quad[..., 0, :] * w00 + quad[..., 1, :] * w01
                + quad[..., 2, :] * w10 + quad[..., 3, :] * w11)

    from mri_raytracer_tpu.ops.pallas_warp import TILE_I, TILE_J

    # O % 128: Mosaic DMA slices must be lane-tile aligned — when the
    # window clamps to a small plane (min(win, O) with O < 128, e.g. the
    # low-res fit_from_views configs), the copy size is unaligned and the
    # kernel fails to compile. Such planes are cheap; gather handles them.
    if use_pallas and height % TILE_I == 0 and width % TILE_J == 0 \
            and O % 128 == 0:
        from mri_raytracer_tpu.ops.pallas_warp import (warp_fit_starts,
                                                       warp_pallas_exec)

        C3 = jnp.moveaxis(C, -1, 0)
        it, jt, starts, fits = warp_fit_starts(i_map, j_map, O, height,
                                               width, win=win)
        # The kernel must execute ONLY when the footprint fits: running it
        # unconditionally and discarding the result through the cond was
        # observed to corrupt the frame when the fused Pallas compositor
        # lives in the same program (diag pose at 1024^2: 40.7 dB with the
        # stray kernel vs 64.3 dB without, identical cond selection).
        out = jax.lax.cond(
            fits,
            lambda: warp_pallas_exec(C3, it, jt, starts, height, width,
                                     win=win),
            lambda: gather_warp(C, i_map, j_map))
    else:
        out = gather_warp(C, i_map, j_map)
    out = jnp.where(valid[..., None], out, 0.0)
    return bg[None, None, :] + out


# ------------------------------------------------------------------ front-end
@functools.partial(jax.jit, static_argnames=("axis", "has_seg", "has_pred"))
def prepare_sweep_volumes(mods, seg, pred, p, axis, has_seg, has_pred):
    """Blend modalities + permute volumes for one sweep axis.

    Camera-independent (depends only on volumes + blend weights), so callers
    cache the result across frames: the blend+transpose measures ~7 ms at
    256^3 on v5e — charging it per frame would dominate the frame budget.
    """
    mixed = blend_modalities(mods, p.vol_enabled[: mods.shape[0]],
                             p.vol_weight[: mods.shape[0]])
    mixed_s = _perm_volume(mixed, axis)
    seg_s = _perm_volume(seg, axis) if has_seg else None
    pred_s = _perm_volume(pred, axis) if has_pred else None
    return mixed_s, seg_s, pred_s


def content_geometry(basis, p, dims_local, axis, out_res, width, height,
                     z_offset=None, nk_global=None, ab_offset=None,
                     inplane_global=None) -> SweepGeom:
    """Sweep geometry for (possibly cropped/slabbed) prepared volumes —
    the single source of the content-box contract, shared by the
    compositing and warp halves of the split pipeline (they run in
    SEPARATE jit programs, see ``render_prepared``) and by the neural
    fused path; the geometry must match bit-exactly across programs, so
    it is built from the same traced offsets in each."""
    Kl, Nal, Nbl = dims_local
    nk = nk_global if nk_global is not None else Kl
    na_g, nb_g = inplane_global if inplane_global is not None else (Nal, Nbl)
    z0 = jnp.float32(0.0) if z_offset is None \
        else jnp.asarray(z_offset, jnp.float32)
    if ab_offset is None:
        a_lo = b_lo = jnp.float32(0.0)
    else:
        a_lo = jnp.asarray(ab_offset[0], jnp.float32)
        b_lo = jnp.asarray(ab_offset[1], jnp.float32)
    content_lo = jnp.stack([z0, a_lo, b_lo])
    k_hi = z0 + Kl if z_offset is not None else jnp.float32(nk)
    content_hi = jnp.stack([k_hi, a_lo + Nal, b_lo + Nbl])
    return sweep_geometry(basis, p, (nk, na_g, nb_g), axis, out_res,
                          content_lo, content_hi,
                          frustum_wh=(width, height))


def _sweep_scalars_np(basis, p, dims_perm, axis, out_res, content_lo=None,
                      content_hi=None, frustum_wh=None):
    """Host (numpy) twin of ``sweep_geometry``'s MAP scalars — returns
    ``(w_base, e, a0, da, b0, db)`` with the same math as the traced
    version (guarded by tests/test_shearwarp.py::test_sweep_scalars_np).

    Exists so the renderer can bound the screen-warp's per-tile source
    footprint analytically BEFORE dispatch (``warp_window_hint``) and pick
    the smallest compiled kernel-window variant; all inputs are host values
    (the camera basis is host numpy, params leaves are host, crop offsets
    are Python ints at prep time), so this costs no device round-trip."""
    order = {0: (0, 1, 2), 1: (1, 0, 2), 2: (2, 0, 1)}[axis]

    def perm(v):
        v = np.asarray(v, np.float32)
        return np.array([v[order[0]], v[order[1]], v[order[2]]],
                        np.float32)

    # float32 throughout: mirrors the traced math bit-for-bit closely
    # enough that tie-breaks (e.g. the base-plane pick at symmetric poses)
    # agree with the device program.
    Nk, Na, Nb = dims_perm
    bmin = perm(p.vol_min)
    vox = perm(p.voxel_size)
    e = perm(basis.eye)
    dimsf = np.array([Nk, Na, Nb], np.float32)
    c_lo = np.zeros(3, np.float32) if content_lo is None \
        else np.asarray(content_lo, np.float32)
    c_hi = dimsf if content_hi is None \
        else np.asarray(content_hi, np.float32)

    w_lo = bmin[0] + vox[0] * c_lo[0]
    w_hi = bmin[0] + vox[0] * c_hi[0]
    w_base = w_hi if abs(w_hi - e[0]) > abs(w_lo - e[0]) else w_lo

    ca = bmin[1] + vox[1] * np.array([c_lo[1], c_hi[1]])
    cb = bmin[2] + vox[2] * np.array([c_lo[2], c_hi[2]])
    ck = np.array([w_lo, w_hi])
    K, A, B = np.meshgrid(ck, ca, cb, indexing="ij")
    denom = K.reshape(-1) - e[0]
    denom = np.where(np.abs(denom) < _EPS, _EPS, denom)
    lam = np.clip((w_base - e[0]) / denom, 0.0, 64.0)
    proj_a = e[1] + lam * (A.reshape(-1) - e[1])
    proj_b = e[2] + lam * (B.reshape(-1) - e[2])
    size_a = ca[1] - ca[0]
    size_b = cb[1] - cb[0]
    amin, amax = proj_a.min(), proj_a.max()
    bmin2, bmax2 = proj_b.min(), proj_b.max()
    if frustum_wh is not None:
        W, H = frustum_wh
        f = 1.0 / np.tan(0.5 * float(basis.fov_y))
        aspect = W / max(1.0, float(H))
        ux = (0.5 / W) * 2.0 - 1.0
        vy = (0.5 / H) * 2.0 - 1.0
        right = np.asarray(basis.right, np.float32)
        up = np.asarray(basis.up, np.float32)
        fwd = np.asarray(basis.forward, np.float32)
        hits_a, hits_b, ts = [], [], []
        for sx in (ux, -ux):
            for sy in (vy, -vy):
                d = (sx * aspect / f) * right + (-sy / f) * up + fwd
                dp = perm(d)
                dk = dp[0] if abs(dp[0]) >= _EPS else _EPS
                t = (w_base - e[0]) / dk
                ts.append(t)
                hits_a.append(e[1] + t * dp[1])
                hits_b.append(e[2] + t * dp[2])
        if min(ts) > 0.0:
            fa = np.array(hits_a)
            fb = np.array(hits_b)
            pad_a = 0.01 * (fa.max() - fa.min())
            pad_b = 0.01 * (fb.max() - fb.min())
            amin = max(amin, fa.min() - pad_a)
            amax = min(amax, fa.max() + pad_a)
            bmin2 = max(bmin2, fb.min() - pad_b)
            bmax2 = min(bmax2, fb.max() + pad_b)
    amin = np.clip(amin, ca[0] - 8.0 * size_a, ca[1] + 8.0 * size_a)
    amax = np.clip(amax, ca[0] - 8.0 * size_a, ca[1] + 8.0 * size_a)
    bmin2 = np.clip(bmin2, cb[0] - 8.0 * size_b, cb[1] + 8.0 * size_b)
    bmax2 = np.clip(bmax2, cb[0] - 8.0 * size_b, cb[1] + 8.0 * size_b)
    da = max(amax - amin, _EPS) / (out_res - 1)
    db = max(bmax2 - bmin2, _EPS) / (out_res - 1)
    return w_base, e, amin, da, bmin2, db


def warp_window_hint(basis, p, dims_perm, axis, out_res, width, height,
                     content_lo=None, content_hi=None):
    """Host-side analytic bound of the screen-warp's per-tile source
    footprint -> the smallest Pallas warp-window variant that holds it
    (``pallas_warp.WINDOW_LADDER``). Evaluates the warp homography at
    tile-corner pixel centers in numpy (~1k points, no device work); the
    in-program ``warp_fit_starts`` check with the chosen window remains the
    correctness gate, so an underestimating hint only costs the gather
    fallback on that frame, never a wrong image."""
    from mri_raytracer_tpu.ops.pallas_warp import (TILE_I, TILE_J,
                                                   choose_window)

    w_base, e, a0, da, b0, db = _sweep_scalars_np(
        basis, p, dims_perm, axis, out_res, content_lo, content_hi,
        (width, height))
    order = {0: (0, 1, 2), 1: (1, 0, 2), 2: (2, 0, 1)}[axis]
    right = np.asarray(basis.right, np.float64)
    up = np.asarray(basis.up, np.float64)
    fwd = np.asarray(basis.forward, np.float64)
    R = np.array([right[o] for o in order])
    U = np.array([up[o] for o in order])
    F = np.array([fwd[o] for o in order])
    f = 1.0 / np.tan(0.5 * float(basis.fov_y))
    aspect = width / max(1.0, float(height))
    cols = np.append(np.arange(0, width, TILE_J), width - 1)
    rows = np.append(np.arange(0, height, TILE_I), height - 1)
    cx = (((cols + 0.5) / width * 2.0 - 1.0) * aspect / f)[None, :]
    cy = (-((rows + 0.5) / height * 2.0 - 1.0) / f)[:, None]
    dk = cx * R[0] + cy * U[0] + F[0]
    da_ = cx * R[1] + cy * U[1] + F[1]
    db_ = cx * R[2] + cy * U[2] + F[2]
    denom = np.where(np.abs(dk) < _EPS, _EPS, dk)
    t_base = (w_base - e[0]) / denom
    i_map = np.clip((e[1] + t_base * da_ - a0) / da, 0.0, out_res - 1.0)
    j_map = np.clip((e[2] + t_base * db_ - b0) / db, 0.0, out_res - 1.0)

    def span(m):
        m = np.floor(m)
        hi = np.maximum(np.maximum(m[:-1, :-1], m[:-1, 1:]),
                        np.maximum(m[1:, :-1], m[1:, 1:]))
        lo = np.minimum(np.minimum(m[:-1, :-1], m[:-1, 1:]),
                        np.minimum(m[1:, :-1], m[1:, 1:]))
        return float((hi - lo).max()) + 1.0

    return choose_window(span(i_map), span(j_map), O=out_res)


def crop_out_res(base_res: int, crops, dims_perm):
    """Shared crop→intermediate-resolution rule (the production renderer
    and the fused neural renderer must agree or their compiled programs
    diverge): when the in-plane content box is cropped, shrink the
    intermediate plane to the content fraction, rounded UP to 128 (the
    Pallas lane tile) with a 128 floor — the round-up only ever raises
    sampling density. Returns ``(out_res, inplane_cropped)``."""
    (_, _), (a_lo, a_hi), (b_lo, b_hi) = crops
    _, na_g, nb_g = dims_perm
    inplane_cropped = (a_lo, a_hi, b_lo, b_hi) != (0, na_g, 0, nb_g)
    if not inplane_cropped:
        return base_res, False
    frac = max((a_hi - a_lo) / na_g, (b_hi - b_lo) / nb_g)
    return min(base_res, max(128, -(-int(base_res * frac) // 128) * 128)), \
        True


def warp_win_hint_or_max(basis, p, dims_perm, axis, out_res, width, height,
                         crops):
    """``warp_window_hint`` with the shared fallback rule: any hint failure
    returns the ladder-max TUPLE, not None — both select the same window,
    but they are distinct static jit cache keys and warmup only precompiles
    the ladder tuples; a None would trigger a fresh warp-program compile
    mid-orbit (minutes over the remote-compile tunnel)."""
    from mri_raytracer_tpu.ops.pallas_warp import WINDOW_LADDER

    (k_lo, _), (a_lo, _), (b_lo, _) = crops
    (_, k_hi), (_, a_hi), (_, b_hi) = crops
    try:
        return warp_window_hint(basis, p, tuple(dims_perm), axis, out_res,
                                width, height,
                                content_lo=(k_lo, a_lo, b_lo),
                                content_hi=(k_hi, a_hi, b_hi))
    except Exception:
        return WINDOW_LADDER[-1]


def warmup_window_variants(render_fn, ladder: bool) -> None:
    """Shared warmup loop: render one pose per sweep axis (face-x, face-y,
    top) — and, on the fused TPU path (``ladder=True``), once per
    warp-window ladder rung per axis — so an interactive orbit never hits
    a compile stall when the dominant axis or the footprint hint's window
    flips mid-orbit. ``render_fn(basis, win)`` must force the given window
    variant (None = backend default)."""
    import math

    from mri_raytracer_tpu.render.camera import OrbitalCamera

    wins = (None,)
    if ladder:
        from mri_raytracer_tpu.ops.pallas_warp import WINDOW_LADDER

        wins = WINDOW_LADDER
    out = None
    for theta, phi in ((0.0, math.pi / 2), (math.pi / 2, math.pi / 2),
                       (0.0, 0.05)):
        cam = OrbitalCamera(radius=2.0, theta=theta, phi=phi)
        for win in wins:
            out = render_fn(cam.basis(), win)
    jax.block_until_ready(out)


def _render_prepared_impl(mixed_s, seg_s, pred_s, basis_vec, p, axis, width,
                          height, out_res, supersample, use_gamma, use_clip,
                          use_pallas, composite, z_offset=None,
                          nk_global=None, ab_offset=None,
                          inplane_global=None, warp=True,
                          _unsafe_coexist=False, echo=None):
    basis = unpack_basis(basis_vec)
    geom = content_geometry(basis, p, mixed_s.shape, axis, out_res, width,
                            height, z_offset, nk_global, ab_offset,
                            inplane_global)
    if composite == "pallas" and supersample == 1 and out_res % 128 == 0:
        from mri_raytracer_tpu.ops.pallas_composite import sweep_composite_pallas

        C, T = sweep_composite_pallas(mixed_s, seg_s, pred_s, geom, p, axis,
                                      out_res, use_gamma, use_clip,
                                      z_offset=z_offset, nk_global=nk_global,
                                      echo=echo)
        # NEVER put the Pallas warp kernel in the same program as the fused
        # compositor: even gated behind lax.cond with the gather branch
        # SELECTED, its mere presence in the compiled program corrupts the
        # compositor's output at near-diagonal poses (measured 40.66 vs
        # 64.05 dB at 1024^2/256^3, scripts/diag_flags.py, r4) — the same
        # Mosaic coexistence class as the two-stream DMA corruption
        # (pallas_composite._make_kernel). Callers that want the fast warp
        # split the pipeline at this boundary (render_prepared).
        # ``_unsafe_coexist=True`` keeps the requested warp anyway — ONLY
        # for forensics that deliberately reproduce the miscompile
        # (scripts/diag_flags.py); never production.
        if not _unsafe_coexist:
            use_pallas = False
    else:
        # Per-plane scan with unroll: smaller live intermediates than the
        # slab-batched einsum variant (slab kept for reference/tests).
        # 'scan_remat' = the differentiable-training variant (per-plane
        # jax.checkpoint: O(out_res^2) backward memory at any depth).
        C, T = sweep_composite(mixed_s, seg_s, pred_s, geom, p, axis, out_res,
                               supersample, use_gamma, use_clip,
                               z_offset=z_offset, nk_global=nk_global,
                               remat=composite == "scan_remat")
    if not warp:
        # With echo instrumentation the debug channel (T's slot) is the
        # payload (e.g. executed-plane counts for utils/arith).
        return T if echo else C
    return warp_to_screen(C, geom, basis, axis, width, height, p.bg_color,
                          use_pallas=use_pallas)


@functools.partial(jax.jit,
                   static_argnames=("axis", "width", "height", "out_res",
                                    "supersample", "has_seg", "has_pred",
                                    "use_gamma", "use_clip", "use_pallas",
                                    "composite", "nk_global",
                                    "inplane_global", "warp",
                                    "_unsafe_coexist", "echo"))
def _render_prepared(mixed_s, seg_s, pred_s, basis_vec, p, axis, width,
                     height, out_res, supersample, has_seg, has_pred,
                     use_gamma=True, use_clip=True, use_pallas=False,
                     composite="scan", z_offset=None, nk_global=None,
                     ab_offset=None, inplane_global=None, warp=True,
                     _unsafe_coexist=False, echo=None):
    return _render_prepared_impl(mixed_s, seg_s if has_seg else None,
                                 pred_s if has_pred else None, basis_vec, p,
                                 axis, width, height, out_res, supersample,
                                 use_gamma, use_clip, use_pallas, composite,
                                 z_offset, nk_global, ab_offset,
                                 inplane_global, warp=warp,
                                 _unsafe_coexist=_unsafe_coexist, echo=echo)


@functools.partial(jax.jit,
                   static_argnames=("axis", "width", "height", "out_res",
                                    "dims_local", "nk_global",
                                    "inplane_global", "use_pallas", "win"))
def warp_program(C, basis_vec, p, axis, width, height, out_res, dims_local,
                 z_offset=None, nk_global=None, ab_offset=None,
                 inplane_global=None, use_pallas=True, win=None):
    """Standalone warp half of the split pipeline: rebuilds the (cheap,
    scalar-dominated) sweep geometry from the same traced offsets as the
    compositing program, then warps the intermediate to screen. Lives in
    its OWN jit program so the Pallas warp kernel never shares a compiled
    program with the fused Pallas compositor (coexistence miscompile —
    see _render_prepared_impl). ``win``: static kernel-window variant
    (pallas_warp.WINDOW_LADDER), host-selected per frame from the analytic
    footprint bound (warp_window_hint)."""
    basis = unpack_basis(basis_vec)
    geom = content_geometry(basis, p, dims_local, axis, out_res, width,
                            height, z_offset, nk_global, ab_offset,
                            inplane_global)
    return warp_to_screen(C, geom, basis, axis, width, height, p.bg_color,
                          use_pallas=use_pallas, win=win)


def render_prepared(mixed_s, seg_s, pred_s, basis, p, axis, width, height,
                    out_res, supersample=1, use_gamma=True, use_clip=True,
                    composite="scan", z_offset=None, nk_global=None,
                    ab_offset=None, inplane_global=None, warp_win=None,
                    echo=None):
    """Per-frame renderer over cached prepared volumes (the interactive path).

    ``z_offset``/``nk_global``: slab contract (empty-space k-crop or sharded
    volumes) — the prepared volumes hold slices
    [z_offset, z_offset + K) of an ``nk_global``-deep volume.
    ``ab_offset``/``inplane_global``: the in-plane analog (content crop) —
    prepared volumes hold rows [a_off, a_off + Na) x cols [b_off, b_off + Nb)
    of an (na_g, nb_g) in-plane extent, and the intermediate image covers
    only the content box's projection.
    ``warp_win``: static Pallas warp-window variant for the split pipeline
    (pallas_warp.WINDOW_LADDER; None = ladder max) — callers pick it per
    frame via ``warp_window_hint``.
    ``echo``: fused-compositor instrumentation channel
    (pallas_composite ``echo``; e.g. 'planes' = executed-plane counts for
    utils/arith) — returns the (out_res, out_res) echo payload INSTEAD of
    an image. Fused Pallas path only.
    """
    if echo is not None and composite != "pallas":
        raise ValueError("echo instrumentation requires the fused "
                         "Pallas compositor")
    zeros = jnp.zeros((1, 1, 1), jnp.int32)
    use_pallas = jax.default_backend() == "tpu"
    z_off = None if z_offset is None else jnp.asarray(z_offset, jnp.float32)
    ab = None if ab_offset is None else (
        jnp.asarray(ab_offset[0], jnp.float32),
        jnp.asarray(ab_offset[1], jnp.float32))
    basis_vec = basis.pack() if isinstance(basis, CameraBasis) else basis
    fused = (composite == "pallas" and supersample == 1
             and out_res % 128 == 0)
    if fused and use_pallas:
        # The (13,) camera goes to both programs as a plain jit argument:
        # the arg-transfer path is pipelined with execution, while an
        # explicit jax.device_put measures a BLOCKING ~3.2 ms round-trip
        # over the tunnel (scripts/diag_flags.py follow-up, r4).
        # Split pipeline: fused Pallas compositing and the Pallas warp must
        # live in SEPARATE jit programs (coexistence miscompile, see
        # _render_prepared_impl). Two async dispatches per frame; the
        # intermediate C (out_res^2 x 3 f32) stays device-resident.
        C = _render_prepared(mixed_s,
                             seg_s if seg_s is not None else zeros,
                             pred_s if pred_s is not None else zeros,
                             basis_vec, p, axis, width, height, out_res,
                             supersample, seg_s is not None,
                             pred_s is not None, use_gamma, use_clip,
                             False, composite, z_off, nk_global, ab,
                             inplane_global, warp=False, echo=echo)
        if echo is not None:
            return C  # echo payload, not an image — skip the warp
        return warp_program(C, basis_vec, p, axis, width, height, out_res,
                            tuple(int(d) for d in mixed_s.shape), z_off,
                            nk_global, ab, inplane_global, use_pallas=True,
                            win=warp_win)
    if echo is not None:
        # The composite=='pallas' guard above passed but the fused kernel
        # is NOT being taken (non-TPU backend, supersample > 1, or
        # out_res % 128) — returning the fallback's rendered image as an
        # "echo payload" would feed garbage into utils/arith silently.
        raise ValueError(
            "echo instrumentation requires the fused Pallas path "
            f"(backend={jax.default_backend()}, supersample={supersample}, "
            f"out_res={out_res} — need TPU, supersample=1, out_res%128==0)")
    return _render_prepared(mixed_s, seg_s if seg_s is not None else zeros,
                            pred_s if pred_s is not None else zeros,
                            basis_vec,
                            p, axis, width, height, out_res, supersample,
                            seg_s is not None, pred_s is not None,
                            use_gamma, use_clip, use_pallas, composite,
                            z_off, nk_global, ab, inplane_global)


@functools.partial(jax.jit,
                   static_argnames=("axis", "width", "height", "out_res",
                                    "supersample", "has_seg", "has_pred",
                                    "use_gamma", "use_clip", "use_pallas",
                                    "composite"))
def _render_sweep_axis(mods, seg, pred, basis_vec, p, axis, width, height,
                       out_res, supersample, has_seg, has_pred,
                       use_gamma=True, use_clip=True, use_pallas=False,
                       composite="scan"):
    mixed = blend_modalities(mods, p.vol_enabled[: mods.shape[0]],
                             p.vol_weight[: mods.shape[0]])
    mixed_s = _perm_volume(mixed, axis)
    seg_s = _perm_volume(seg, axis) if has_seg else None
    pred_s = _perm_volume(pred, axis) if has_pred else None
    return _render_prepared_impl(mixed_s, seg_s, pred_s, basis_vec, p, axis,
                                 width, height, out_res, supersample,
                                 use_gamma, use_clip, use_pallas, composite)


def dominant_axis(basis) -> int:
    """Host-side choice of sweep axis (forward component largest)."""
    import numpy as np

    fwd = basis.forward if isinstance(basis, CameraBasis) else basis[9:12]
    f = np.abs(np.asarray(fwd))
    return int(np.argmax(f))


def render_brats(mods: jnp.ndarray, seg: Optional[jnp.ndarray],
                 pred: Optional[jnp.ndarray], basis: CameraBasis,
                 p: BratsRenderParams, width: int = 1024, height: int = 1024,
                 max_steps: int = 1024, out_res: Optional[int] = None,
                 supersample: int = 1, use_gamma: Optional[bool] = None,
                 use_clip: Optional[bool] = None,
                 composite: str = "scan",
                 axis: Optional[int] = None) -> jnp.ndarray:
    """Drop-in fast replacement for raymarch_xla.render_brats.

    ``composite``: 'scan' (XLA lax.scan compositing), 'scan_remat' (same,
    with per-plane rematerialization — the differentiable-training variant:
    ``jax.grad`` w.r.t. ``mods`` flows through the whole shear-warp
    factorization with O(out_res^2) backward memory), or 'pallas' (fused
    VMEM-resident compositing kernel, TPU only; requires supersample == 1
    and out_res % 128 == 0, silently falling back to 'scan' otherwise).

    ``axis``: explicit sweep axis. The default derives it host-side from
    the camera (``dominant_axis``), which requires a concrete basis —
    batched/traced callers (e.g. vmap over packed camera vectors in a
    differentiable-rendering loss) group their cameras by axis and pass it.
    """
    out_res = out_res or max(width, height)
    if axis is None:
        axis = dominant_axis(basis)
    zeros = jnp.zeros((1, 1, 1), jnp.int32)
    if use_gamma is None or use_clip is None:
        # Host-side static specialization on rarely-touched params: the
        # reference viewer fixes gamma = 1.0 and ships near/far disabled
        # (brats_viewer.py:132-133,422); toggling recompiles once per combo.
        import numpy as _np

        use_gamma = abs(float(_np.asarray(p.gamma)) - 1.0) > 1e-12
        use_clip = (float(_np.asarray(p.near)) > 0.0) or (float(_np.asarray(p.far)) > 0.0)
    # The differentiable variant must keep the gather warp: the Pallas warp
    # kernel has no VJP rule (and must not share a program with grads).
    use_pallas = jax.default_backend() == "tpu" and composite != "scan_remat"
    if use_pallas and composite == "pallas" and supersample == 1 \
            and out_res % 128 == 0:
        # Route through the split pipeline (prep -> composite -> warp as
        # separate programs): the fused compositor and the Pallas warp must
        # not share a jit program (see _render_prepared_impl). The uncached
        # prep program costs ~7 ms, same as the blend the single program
        # would run in-graph.
        mixed_s, seg_s, pred_s = prepare_sweep_volumes(
            mods, seg if seg is not None else zeros,
            pred if pred is not None else zeros, p, axis,
            seg is not None, pred is not None)
        return render_prepared(mixed_s, seg_s, pred_s, basis, p, axis,
                               width, height, out_res,
                               supersample=supersample, use_gamma=use_gamma,
                               use_clip=use_clip, composite=composite)
    return _render_sweep_axis(mods, seg if seg is not None else zeros,
                              pred if pred is not None else zeros,
                              basis.pack() if isinstance(basis, CameraBasis) else basis,
                              p, axis, width, height, out_res,
                              supersample, seg is not None, pred is not None,
                              use_gamma, use_clip, use_pallas, composite)
