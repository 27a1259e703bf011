"""gfxexp_tpu — a TPU-native (JAX/XLA/Pallas) real-time rendering research framework.

Re-creation of the capability surface of shocker-0x15/GfxExp (reference:
/root/reference) as an idiomatic TPU design:

- wavefront ray tracing over SoA path state instead of OptiX megakernels
- software wide-BVH built on host (numpy + native C++), traversed by batched
  JAX / Pallas kernels instead of RT cores
- branchless batched BSDF evaluation over the closed 3-material set instead of
  SBT callable dispatch
- techniques: path tracing (NEE+MIS), ReSTIR DI, ReGIR, NRC (MXU-resident MLP),
  SVGF (stencil kernels), TFDM / NRTDSM displacement mapping
- multi-chip scaling via `jax.sharding` image-plane sharding over ICI

Subpackages:
  core        math, RNG, sampling distributions, compaction primitives
  scene       scene data model, loaders, materials, lights, animation, CLI DSL
  accel       BVH build (host) + traversal kernels (device)
  render      camera, BSDFs, G-buffer, wavefront path tracer, film
  techniques  restir_di, regir, svgf, nrc, tfdm, nrtdsm
  parallel    device-mesh sharding of the image plane, collectives
  utils       timing, config, checkpointing, image I/O
"""

__version__ = "0.1.0"
