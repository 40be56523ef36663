"""Multi-host (multi-process) distribution: real OS processes over gloo CPU
collectives must reproduce the single-process sharded render + gradients
(SURVEY.md §5.8; the GPUSPECTRAL_FAKE_HOSTS simulation promised by
parallel/launch.py)."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import pathlib

REPO = pathlib.Path(__file__).resolve().parents[1]


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_sharded_render_matches_single(tmp_path):
    n_hosts = 2
    port = _free_port()
    outs = [str(tmp_path / f"host{i}.npz") for i in range(n_hosts)]
    procs = []
    for i in range(n_hosts):
        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
        env["GPUSPECTRAL_FAKE_HOSTS"] = str(n_hosts)
        env["GPUSPECTRAL_FAKE_HOST_ID"] = str(i)
        env["GPUSPECTRAL_COORDINATOR"] = f"127.0.0.1:{port}"
        procs.append(
            subprocess.Popen(
                [sys.executable, str(REPO / "tests/mh_worker.py"), outs[i]],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            )
        )
    for i, p in enumerate(procs):
        out, err = p.communicate(timeout=540)
        assert p.returncode == 0, f"host {i} failed:\n{err.decode()[-3000:]}"

    res = np.load(outs[0])
    assert res["processes"] == n_hosts
    assert res["devices"] == 4  # 2 hosts x 2 virtual chips

    # single-process reference on an equal 4-device mesh
    from gpuspectral_tpu.parallel.dist import grad_step_sharded, make_mesh, render_image_sharded
    from gpuspectral_tpu.scene import load_mitsuba_scene
    from gpuspectral_tpu.utils import RenderConfig

    scene, _ = load_mitsuba_scene(str(REPO / "scenes/cornell/scene.xml"))
    cfg = RenderConfig(width=16, height=8, spp=4, max_depth=2, ray_batch=128)
    mesh = make_mesh(4, spp_shards=2)
    img1 = np.asarray(render_image_sharded(scene, cfg, mesh))
    loss1, grads1 = grad_step_sharded(scene, cfg, mesh, np.zeros((8, 16, 3), np.float32))

    np.testing.assert_allclose(res["img"], img1, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(res["loss"]), float(loss1), rtol=1e-5)
    np.testing.assert_allclose(res["grads"], np.asarray(grads1), rtol=1e-4, atol=1e-8)


def test_sharded_fast_matches_unsharded_mega_bvh():
    """render_image_sharded_fast routes through the fused-BVH megakernel
    per shard (VERDICT r3 #3); on the virtual 8-device mesh its image must
    match the unsharded kernel (same sample set: spp shards render
    disjoint progressive-frame ranges whose union is the full spp)."""
    import jax
    import numpy as np

    from gpuspectral_tpu.integrator.mega_bvh import (
        mega_bvh_eligible, render_mega_bvh)
    from gpuspectral_tpu.parallel.dist import (
        make_mesh, render_image_sharded_fast)
    from gpuspectral_tpu.scene import load_mitsuba_scene
    from gpuspectral_tpu.utils import RenderConfig

    scene, _ = load_mitsuba_scene("scenes/cornell/scene.xml")
    cfg = RenderConfig(width=32, height=32, spp=4, max_depth=3,
                       ray_batch=1024, use_bvh=True, jitter=False,
                       light_sampling="power", mis_mode="exact")
    assert mega_bvh_eligible(scene, cfg)
    mesh = make_mesh(8, spp_shards=2)
    img_s, nrays_s = render_image_sharded_fast(
        scene, cfg, mesh, timestamp0=0, interpret=True)
    img_u, nrays_u = render_mega_bvh(scene, cfg, 0, interpret=True)
    img_s, img_u = np.asarray(img_s), np.asarray(img_u)
    assert np.isfinite(img_s).all()
    # identical sample set; only the accumulation order differs
    assert np.allclose(img_s, img_u, atol=1e-5), np.abs(img_s - img_u).max()
    assert float(nrays_s) == float(nrays_u)


def test_sharded_fast_brute_path():
    """Non-BVH configs route through the brute megakernel per shard."""
    import numpy as np

    from gpuspectral_tpu.integrator.mega import mega_eligible, render_mega
    from gpuspectral_tpu.parallel.dist import (
        make_mesh, render_image_sharded_fast)
    from gpuspectral_tpu.scene import load_mitsuba_scene
    from gpuspectral_tpu.utils import RenderConfig

    scene, _ = load_mitsuba_scene("scenes/cornell/scene.xml")
    cfg = RenderConfig(width=32, height=32, spp=2, max_depth=3,
                       ray_batch=1024, use_bvh=False, jitter=False)
    assert mega_eligible(scene, cfg)
    mesh = make_mesh(8, spp_shards=2)
    img_s, nrays_s = render_image_sharded_fast(
        scene, cfg, mesh, timestamp0=0, interpret=True)
    img_u, nrays_u = render_mega(scene, cfg, 0, interpret=True)
    img_s, img_u = np.asarray(img_s), np.asarray(img_u)
    assert np.allclose(img_s, img_u, atol=1e-5), np.abs(img_s - img_u).max()
    assert float(nrays_s) == float(nrays_u)


def test_grad_sharded_fast_matches_fused_single():
    """grad_step_sharded_fast (VERDICT r4 #3) runs the fused replay
    backward per shard; on the virtual mesh its loss/grads must match the
    single-device fused custom_vjp gradient of the same MSE."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gpuspectral_tpu.integrator.mega_grad import (
        mega_bvh_grad_eligible, render_mega_bvh_diff)
    from gpuspectral_tpu.parallel.dist import make_mesh, grad_step_sharded_fast
    from gpuspectral_tpu.scene import load_mitsuba_scene
    from gpuspectral_tpu.utils import RenderConfig

    scene, _ = load_mitsuba_scene("scenes/cornell/scene.xml")
    cfg = RenderConfig(width=32, height=32, spp=4, max_depth=3,
                       ray_batch=1024, use_bvh=True, jitter=False,
                       light_sampling="power", mis_mode="exact")
    assert mega_bvh_grad_eligible(scene, cfg)
    rng = np.random.default_rng(7)
    target = rng.uniform(0.0, 1.0, (32, 32, 3)).astype(np.float32)

    mesh = make_mesh(8, spp_shards=2)
    loss_s, g_s = grad_step_sharded_fast(
        scene, cfg, mesh, target, timestamp0=0, interpret=True)

    def loss_fn(bp):
        img = render_mega_bvh_diff(
            scene.replace(bsdf_params=bp), cfg, 0, interpret=True)
        return jnp.mean((img - target) ** 2)

    loss_u, g_u = jax.value_and_grad(loss_fn)(scene.bsdf_params)
    np.testing.assert_allclose(float(loss_s), float(loss_u), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g_s), np.asarray(g_u),
                               rtol=1e-4, atol=1e-7)


def test_grad_sharded_fast_brute_path():
    """The brute-kernel (non-BVH) fused gradient also shards."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gpuspectral_tpu.integrator.mega_grad import (
        mega_grad_eligible, render_mega_diff)
    from gpuspectral_tpu.parallel.dist import make_mesh, grad_step_sharded_fast
    from gpuspectral_tpu.scene import load_mitsuba_scene
    from gpuspectral_tpu.utils import RenderConfig

    scene, _ = load_mitsuba_scene("scenes/cornell/scene.xml")
    cfg = RenderConfig(width=32, height=32, spp=4, max_depth=3,
                       ray_batch=1024, use_bvh=False, jitter=False)
    assert mega_grad_eligible(scene, cfg)
    rng = np.random.default_rng(8)
    target = rng.uniform(0.0, 1.0, (32, 32, 3)).astype(np.float32)

    mesh = make_mesh(8, spp_shards=2)
    loss_s, g_s = grad_step_sharded_fast(
        scene, cfg, mesh, target, timestamp0=0, interpret=True)

    def loss_fn(bp):
        img = render_mega_diff(
            scene.replace(bsdf_params=bp), cfg, 0, interpret=True)
        return jnp.mean((img - target) ** 2)

    loss_u, g_u = jax.value_and_grad(loss_fn)(scene.bsdf_params)
    np.testing.assert_allclose(float(loss_s), float(loss_u), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g_s), np.asarray(g_u),
                               rtol=1e-4, atol=1e-7)
