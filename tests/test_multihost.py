"""Multi-host (DCN) smoke: two real processes, jax.distributed over
localhost, a global 2x(4-CPU) mesh, and a psum'd train-like step.

The reference has no distributed story at all (SURVEY §2.5); this validates
the framework's multi-host bring-up path (``parallel/mesh.py:
initialize_distributed``) end-to-end with actual separate processes — the
closest a single machine gets to the two-pod topology.
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

_WORKER = textwrap.dedent("""
    import os, sys
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from mri_raytracer_tpu.parallel import mesh as mesh_mod

    pid = int(sys.argv[1])
    port = sys.argv[2]
    mesh_mod.initialize_distributed(f"localhost:{port}", 2, pid)
    assert jax.process_count() == 2, jax.process_count()
    devs = jax.devices()
    assert len(devs) == 8, len(devs)  # 2 processes x 4 local CPU devices

    mesh = Mesh(np.asarray(devs).reshape(8, 1), ("data", "space"))
    sharding = NamedSharding(mesh, P("data"))

    # Global data-parallel reduction: each of the 8 shards (4 per process)
    # contributes (pid+1) * 2 elements; the psum must see all shards across
    # BOTH processes: 4*2*1 + 4*2*2 = 24.
    garr = jax.make_array_from_single_device_arrays(
        (8, 2), sharding,
        [jax.device_put(jnp.full((1, 2), float(pid + 1)), d)
         for d in jax.local_devices()])

    from jax import shard_map

    def body(x):
        return jax.lax.psum(x.sum(), "data")

    out = jax.jit(shard_map(body, mesh=mesh, in_specs=P("data"),
                            out_specs=P()))(garr)
    expect = 24.0
    got = float(out)
    assert got == expect, (got, expect)
    print(f"proc{pid}: psum over 2 hosts ok ({got})", flush=True)
""")


_WORKER_TRAIN = textwrap.dedent("""
    import os, sys
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import optax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from mri_raytracer_tpu.config import LossConfig, ModelConfig
    from mri_raytracer_tpu.data import sampling, synthetic, brats
    from mri_raytracer_tpu.models.api import build_model
    from mri_raytracer_tpu.parallel import mesh as mesh_mod
    from mri_raytracer_tpu.parallel.training import build_dp_train_step

    pid = int(sys.argv[1])
    port = sys.argv[2]
    mesh_mod.initialize_distributed(f"localhost:{port}", 2, pid)
    devs = jax.devices()
    assert len(devs) == 8, len(devs)
    mesh = Mesh(np.asarray(devs).reshape(8), ("data",))
    rep = NamedSharding(mesh, P())

    def repl(x):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, rep, lambda i: x[i])

    # Identical synthetic pool on both processes (same seed).
    pool_m, pool_s = [], []
    for c in range(2):
        mods, seg = synthetic.synthetic_case((16, 16, 12), seed=c)
        pool_m.append(np.stack([brats.zscore_nonzero(m.copy())
                                for m in mods]))
        pool_s.append(seg.astype(np.int32))
    mods_pool = repl(np.stack(pool_m).astype(np.float32))
    segs_pool = repl(np.stack(pool_s))

    cfg = ModelConfig(hidden_dims=(16, 16), fourier_freqs=2, num_classes=4)
    model = build_model(cfg, num_modalities=4)
    params_h = jax.tree_util.tree_map(np.asarray,
                                      model.init(jax.random.PRNGKey(0)))
    opt = optax.adam(1e-3)
    opt_state_h = opt.init(params_h)
    params = jax.tree_util.tree_map(repl, params_h)
    opt_state = jax.tree_util.tree_map(repl, opt_state_h)
    sampler = sampling.make_sampler("uniform", 64)
    step_fn = build_dp_train_step(model, LossConfig(), opt, sampler,
                                  accum_steps=1, data_parallel=8, mesh=mesh)

    key = repl(np.asarray(jax.random.PRNGKey(7)))
    losses = []
    for s in range(3):
        params, opt_state, metrics = step_fn(
            params, opt_state, key, mods_pool, segs_pool,
            repl(np.int32(s)))
        losses.append(float(jax.device_get(metrics.loss)))
    assert all(np.isfinite(l) for l in losses), losses
    leafsum = float(sum(jnp.sum(jnp.abs(l))
                        for l in jax.tree_util.tree_leaves(params)))
    print(f"proc{pid}: dp-train ok losses={losses} leafsum={leafsum:.6f}",
          flush=True)
""")


_WORKER_RENDER = textwrap.dedent("""
    import os, sys
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from mri_raytracer_tpu.data import brats, synthetic
    from mri_raytracer_tpu.ops import shearwarp as sw
    from mri_raytracer_tpu.parallel import mesh as mesh_mod
    from mri_raytracer_tpu.parallel import render as prender
    from mri_raytracer_tpu.render import params as rp
    from mri_raytracer_tpu.render.camera import OrbitalCamera

    pid = int(sys.argv[1])
    port = sys.argv[2]
    mesh_mod.initialize_distributed(f"localhost:{port}", 2, pid)
    devs = jax.devices()
    assert len(devs) == 8, len(devs)
    mesh = Mesh(np.asarray(devs).reshape(1, 8), ("data", "space"))
    rep = NamedSharding(mesh, P())

    def repl(x):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, rep, lambda i: x[i])

    SHAPE = (16, 16, 12)
    mods, seg = synthetic.synthetic_case(SHAPE, seed=2)
    disp = np.stack([brats.percentile_normalize(m) for m in mods])
    p = rp.default_render_params(SHAPE, show_seg=True)
    cam = OrbitalCamera(radius=rp.default_camera_radius(p, SHAPE),
                        theta=0.5, phi=1.1)

    render = prender.build_sharded_renderer(mesh, SHAPE, 64, 64, out_res=64,
                                            has_seg=True, has_pred=False)
    # Ray stripes land 4-per-process; the pre-warp all_gather rides the
    # process boundary (DCN in a real pod).
    img = np.asarray(jax.device_get(render(
        repl(disp.astype(np.float32)), repl(seg.astype(np.int32)), None,
        cam.basis(), p)))

    # Single-device oracle on a LOCAL device (independent of the mesh).
    with jax.default_device(jax.local_devices()[0]):
        ref = np.asarray(sw.render_brats(
            jnp.asarray(disp), jnp.asarray(seg.astype(np.int32)), None,
            cam.basis(), p, 64, 64, out_res=64))
    err = float(np.abs(img - ref).max())
    assert err <= 2e-3, err
    print(f"proc{pid}: sharded render over 2 hosts ok (maxerr={err:.2e}, "
          f"checksum={float(img.sum()):.6f})", flush=True)
""")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_psum(tmp_path):
    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen([sys.executable, str(script), str(i), str(port)],
                              env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{i} failed:\n{out}"
        assert "psum over 2 hosts ok" in out


def test_two_process_dp_train_step(tmp_path):
    """A REAL data-parallel train step across two processes: the full
    build_dp_train_step (in-graph sampler, grad psum over 'data', optax
    update) on a global 2x4-device mesh, params/pools replicated. Both
    processes must report identical finite losses and identical updated
    params (replicated semantics across the process boundary)."""
    port = _free_port()
    script = tmp_path / "worker_train.py"
    script.write_text(_WORKER_TRAIN)
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen([sys.executable, str(script), str(i), str(port)],
                              env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=360)
        outs.append(out)
    lines = []
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{i} failed:\n{out}"
        marker = [ln for ln in out.splitlines() if "dp-train ok" in ln]
        assert marker, out
        lines.append(marker[0].split(":", 1)[1])
    # losses and the param checksum must agree bit-for-bit across processes
    assert lines[0] == lines[1], lines


def test_two_process_sharded_render(tmp_path):
    """A production-renderer frame SHARDED ACROSS two processes: ray
    stripes of the shear-warp composite land 4-per-process and the pre-warp
    ``all_gather`` crosses the process boundary; the assembled frame must
    match the single-device renderer on both processes (and bit-agree
    between them)."""
    port = _free_port()
    script = tmp_path / "worker_render.py"
    script.write_text(_WORKER_RENDER)
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen([sys.executable, str(script), str(i), str(port)],
                              env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=360)
        outs.append(out)
    lines = []
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{i} failed:\n{out}"
        marker = [ln for ln in out.splitlines()
                  if "sharded render over 2 hosts ok" in ln]
        assert marker, out
        lines.append(marker[0].split("checksum=", 1)[1])
    assert lines[0] == lines[1], lines
