from .path_tracer import render_image, trace_rays, render_sample  # noqa: F401


def render_image_stats_auto(scene, cfg, timestamp0: int = 0):
    """Render (H, W, 3) + total rays traced, picking the fastest integrator.

    On TPU, eligible (scene, cfg) pairs (brute-force scale, untextured,
    uniform light selection) run the fused Pallas megakernel (integrator/
    mega.py, measured ~12x the XLA wavefront on Cornell 512^2); everything
    else — BVH scenes, textures, gradients — uses the XLA wavefront.
    `cfg.intersector == "mega"` forces the megakernel (interpreted off-TPU,
    for tests)."""
    import jax
    import jax.numpy as jnp

    from .mega import mega_eligible, render_mega
    from .mega_bvh import mega_bvh_eligible, render_mega_bvh
    from .path_tracer import render_image_stats

    interpret = jax.default_backend() != "tpu"
    forced = cfg.intersector == "mega"
    if mega_eligible(scene, cfg) and (
        forced or (cfg.intersector == "auto" and jax.default_backend() == "tpu")
    ):
        return render_mega(scene, cfg, timestamp0, interpret=interpret)
    # fused-BVH megakernel: auto on TPU (measured 3.2 vs 1.3 Mrays/s for the
    # XLA wavefront on staircase2), or forced via intersector="mega_bvh"
    # (interpreted off-TPU, for tests)
    if mega_bvh_eligible(scene, cfg) and (
        cfg.intersector == "mega_bvh"
        or (cfg.intersector == "auto" and jax.default_backend() == "tpu")
    ):
        return render_mega_bvh(scene, cfg, timestamp0, interpret=interpret)
    if jax.default_backend() == "tpu":
        # host-side batch loop: bounds single-execution device time (the TPU
        # runtime kills executions running for minutes — big slot-mode
        # scenes under one lax.map crashed the worker)
        from .path_tracer import render_image_stats_host

        return render_image_stats_host(scene, cfg, timestamp0)
    return render_image_stats(scene, cfg, jnp.uint32(timestamp0))


def render_image_auto(scene, cfg, timestamp0: int = 0):
    """Render (H, W, 3); see render_image_stats_auto."""
    return render_image_stats_auto(scene, cfg, timestamp0)[0]
