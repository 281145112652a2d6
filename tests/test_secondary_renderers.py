"""SDF sphere tracer, BVH/brute mesh tracer, PLY loader, BC4 codec."""

import numpy as np
import jax.numpy as jnp
import pytest

from mri_raytracer_tpu.data import codecs
from mri_raytracer_tpu.ops import sdf
from mri_raytracer_tpu.render import mesh
from mri_raytracer_tpu.render.camera import OrbitalCamera, camera_rays


# ------------------------------------------------------------------------ SDF
def test_sdf_render_hits_sphere():
    cam = OrbitalCamera(radius=2.5)
    p = sdf.default_sdf_params()
    img = np.asarray(sdf.render_sdf(cam.basis(), p, 64, 64, max_steps=128))
    assert img.shape == (64, 64, 3)
    # center pixel hits the sphere (UV color, blue channel = 1-u)
    center = img[32, 32]
    corner = img[0, 0]
    assert not np.allclose(center, corner)
    # corners are sky gradient values
    assert 0.0 <= corner.min() and corner.max() <= 0.35


def test_sdf_primitives():
    p = jnp.array([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
    np.testing.assert_allclose(np.asarray(sdf.sd_sphere(p, 1.0)), [-1.0, 0.0], atol=1e-6)
    d = sdf.sd_box(p, [0.5, 0.5, 0.5])
    np.testing.assert_allclose(np.asarray(d), [-0.5, 0.5], atol=1e-6)
    u = sdf.sd_union(sdf.sd_sphere(p, 1.0), sdf.sd_box(p, [0.5] * 3))
    np.testing.assert_allclose(np.asarray(u), [-1.0, 0.0], atol=1e-6)


def test_sdf_normal_estimate():
    n = sdf.estimate_normal(lambda p: sdf.sd_sphere(p, 0.6),
                            jnp.array([[0.6, 0.0, 0.0]]), 1e-4)
    np.testing.assert_allclose(np.asarray(n[0]), [1.0, 0.0, 0.0], atol=1e-3)


# ------------------------------------------------------------------- PLY/mesh
def _tetra():
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    tris = np.array([[0, 1, 2], [0, 1, 3], [0, 2, 3], [1, 2, 3]], np.uint32)
    return verts, tris


def test_ply_roundtrip(tmp_path):
    verts, tris = _tetra()
    ply = ["ply", "format ascii 1.0", f"element vertex {len(verts)}",
           "property float x", "property float y", "property float z",
           f"element face {len(tris)}", "property list uchar int vertex_indices",
           "end_header"]
    ply += [" ".join(map(str, v)) for v in verts]
    ply += ["3 " + " ".join(map(str, t)) for t in tris]
    path = tmp_path / "tetra.ply"
    path.write_text("\n".join(ply) + "\n")
    v2, t2 = mesh.load_ply_ascii(path)
    np.testing.assert_allclose(v2, verts)
    np.testing.assert_array_equal(t2, tris)


def test_ply_quad_triangulation(tmp_path):
    ply = ["ply", "format ascii 1.0", "element vertex 4",
           "property float x", "property float y", "property float z",
           "element face 1", "property list uchar int vertex_indices",
           "end_header", "0 0 0", "1 0 0", "1 1 0", "0 1 0", "4 0 1 2 3"]
    path = tmp_path / "quad.ply"
    path.write_text("\n".join(ply) + "\n")
    _, t = mesh.load_ply_ascii(path)
    assert t.shape == (2, 3)


def test_normalize_to_unit_box():
    v = np.array([[0, 0, 0], [10, 4, 2]], np.float32)
    out = mesh.normalize_to_unit_box(v)
    assert abs(out.max() - 1.0) < 1e-6 and abs(out.min() + 1.0) < 1e-6


def test_bvh_build_encoding():
    rng = np.random.default_rng(0)
    verts = rng.uniform(-1, 1, (30, 3)).astype(np.float32)
    tris = rng.integers(0, 30, (20, 3)).astype(np.uint32)
    bvh = mesh.build_bvh(verts, tris)
    nodes = bvh.nodes
    # root bounds contain everything
    assert (nodes[0, 0:3] <= verts[tris].reshape(-1, 3).min(0) + 1e-5).all()
    # leaf-compacted tri count preserved
    assert bvh.tris.shape == tris.shape
    counts = nodes[:, 7]
    leaves = counts > 0
    assert leaves.any() and (counts[leaves] <= 4).all()
    inner = ~leaves
    if inner.any():
        rights = (-counts[inner] - 1).astype(int)
        assert (rights > 0).all() and (rights < len(nodes)).all()


def test_brute_vs_bvh_tracers_agree():
    rng = np.random.default_rng(1)
    verts = rng.uniform(-1, 1, (60, 3)).astype(np.float32)
    tris = rng.integers(0, 60, (40, 3)).astype(np.uint32)
    tris = tris[(tris[:, 0] != tris[:, 1]) & (tris[:, 1] != tris[:, 2])
                & (tris[:, 0] != tris[:, 2])]
    cam = OrbitalCamera(radius=3.0)
    ro, rd = camera_rays(cam.basis(), 32, 32)
    t1, n1, h1 = mesh.trace_brute(ro, rd, jnp.asarray(verts),
                                  jnp.asarray(tris.astype(np.int32)))
    bvh = mesh.build_bvh(verts, tris)
    t2, n2, h2 = mesh.trace_bvh(ro, rd, jnp.asarray(bvh.nodes),
                                jnp.asarray(bvh.tris.astype(np.int32)),
                                jnp.asarray(bvh.verts))
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))
    hm = np.asarray(h1)
    np.testing.assert_allclose(np.asarray(t1)[hm], np.asarray(t2)[hm], rtol=1e-4)


def test_mesh_renderer_end_to_end():
    verts, tris = _tetra()
    r = mesh.MeshRenderer(verts, tris, width=48, height=48)
    cam = OrbitalCamera(radius=3.0)
    img = np.asarray(r.render(cam.basis()))
    assert img.shape == (48, 48, 3)
    assert np.isfinite(img).all()
    # hit pixels shade warm (R >= G >= B: (0.8, 0.7, 0.6) base); sky is cool
    center = img[24, 24]
    assert center[0] > center[2], "center pixel should be a shaded mesh hit"
    assert img[0, 0][2] >= img[0, 0][0], "corner should be sky (blue-ish)"


# ----------------------------------------------------------------------- BC4
def test_bc4_roundtrip_flat_block():
    img = np.full((4, 4), 128, np.uint8)
    data = codecs.encode_bc4(img)
    out = codecs.decode_bc4(data, 4, 4, 1)
    np.testing.assert_allclose(out[0], img, atol=1)


def test_bc4_roundtrip_gradient():
    img = np.linspace(0, 255, 64, dtype=np.uint8).reshape(8, 8)
    data = codecs.encode_bc4(img)
    out = codecs.decode_bc4(data, 8, 8, 1)
    # BC4 is lossy; per-block linear palette approximates a gradient well
    assert np.abs(out[0].astype(int) - img.astype(int)).max() <= 24


def test_bc4_selects_palette_mode():
    # r0 <= r1 mode block: craft raw bytes with r0 < r1, code 7 -> 255
    block = bytes([10, 200]) + bytes([0xFF] * 6)
    out = codecs.decode_bc4(block, 4, 4, 1)
    assert (out == 255).all()


def test_u8_volume_roundtrip(tmp_path):
    import gzip

    vol = np.arange(2 * 3 * 4, dtype=np.uint8).reshape(2, 3, 4)  # (X,Y,Z)
    disk = vol.transpose(2, 1, 0).tobytes()  # z-major on disk
    p = tmp_path / "vol.raw.gz"
    with gzip.open(p, "wb") as f:
        f.write(disk)
    out = codecs.load_u8_volume(p, (2, 3, 4))
    np.testing.assert_array_equal(out, vol)


# ------------------------------------------------------- 2-D noise demo (R5)
def test_simplex_noise_range_and_smoothness():
    """Ashima 2-D simplex noise: zero at lattice corners' gradient centers,
    bounded in [-1, 1], continuous (neighboring samples close), and
    non-degenerate (actual variation across the field)."""
    from mri_raytracer_tpu.ops import noise2d

    xs = jnp.linspace(-3.0, 3.0, 97)
    g = jnp.stack(jnp.meshgrid(xs, xs, indexing="ij"), -1)
    n = np.asarray(noise2d.snoise(g))
    assert np.isfinite(n).all()
    assert n.min() >= -1.0 - 1e-4 and n.max() <= 1.0 + 1e-4
    assert n.std() > 0.1  # non-degenerate
    # Continuity: max step between neighboring samples bounded by the
    # gradient bound times the spacing (loose factor).
    d = max(np.abs(np.diff(n, axis=0)).max(), np.abs(np.diff(n, axis=1)).max())
    assert d < 0.6, d
    n01 = np.asarray(noise2d.snoise01(g))
    np.testing.assert_allclose(n01, n * 0.5 + 0.5, atol=1e-6)


def test_noise_demo_frame_and_animation():
    from mri_raytracer_tpu.ops import noise2d

    f0 = np.asarray(noise2d.render_noise_demo(64, 48, time=0.0))
    f1 = np.asarray(noise2d.render_noise_demo(64, 48, time=0.5))
    assert f0.shape == (48, 64, 3)
    assert np.isfinite(f0).all()
    assert np.abs(f1 - f0).max() > 0.05  # the demo animates
    # Grayscale base (r == g == b without the pointer highlight).
    np.testing.assert_allclose(f0[..., 0], f0[..., 1], atol=1e-6)
    # The pointer highlight adds red only, centered at the mouse.
    fm = np.asarray(noise2d.render_noise_demo(
        64, 48, time=0.0, mouse_pos=jnp.asarray([32.0, 24.0]),
        mouse_radius=10.0))
    dr = fm[..., 0] - f0[..., 0]
    np.testing.assert_allclose(fm[..., 1:], f0[..., 1:], atol=1e-6)
    assert dr[24, 32] > 0.9  # full-strength at the pointer
    assert dr[0, 0] < 1e-6  # zero beyond the radius


def test_noise_app(tmp_path):
    from mri_raytracer_tpu.apps import noise_app

    rc = noise_app.main(["--width", "48", "--height", "32", "--frames", "2",
                         "--mouse", "24,16", "--out", str(tmp_path)])
    assert rc == 0
    assert (tmp_path / "frame_0001.png").exists()
