"""gpuspectral_tpu: a TPU-native differentiable path tracer.

A ground-up JAX/Pallas/pjit re-design of the capabilities of GPUSpectral
(reference: a Vulkan-RT C++ path tracer, /root/reference). Nothing here is a
port: the Vulkan HAL / framegraph / pipeline-cache machinery collapses into
XLA's compilation model, while the parts Vulkan supplied in hardware —
acceleration structures and the raygen/hit/miss execution model — are rebuilt
as TPU kernels (see `bvh/` and `integrator/`).

Layout (mirrors SURVEY.md §7.1):
  scene/       Mitsuba-XML + OBJ loading -> SceneData pytree
  ops/         vectorized math kernels: RNG, sampling, Fresnel/GGX, intersection
  bsdf/        the 8-BSDF library (sample/eval) with vectorized dispatch
  bvh/         LBVH build + flattened nodes + traversal kernels
  integrator/  wavefront path tracer (render step, accumulation)
  diff/        path-replay differentiable rendering
  parallel/    device-mesh sharding (tile x spp) and multi-host helpers
  io/          PNG/EXR/PFM images, checkpoints, metrics
  utils/       config, logging
  cli/         render / benchmark / gradcheck entry points
"""

__version__ = "0.1.0"
