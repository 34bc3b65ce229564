"""BRDF-NeRF-TPU: a TPU-native JAX framework for satellite neural radiance
fields with physically-based BRDF recovery.

This is a ground-up re-design (NOT a port) of the capabilities of the
BRDF-NeRF reference (LulinZhang/BRDF-NeRF): NeRF / Shadow-NeRF / Sat-NeRF /
SpS-NeRF / SpSBRDF-NeRF model families, RPC satellite cameras, dense depth
supervision, RPV / Hapke / Microfacet BRDF heads, DSM evaluation — rebuilt
as pure-functional JAX running under jit/pjit with Pallas fused kernels for
the hot MLP evaluation path and data-parallel ray sharding over a TPU mesh.

Layout:
  config    — static, hashable run configuration (drives XLA specialization)
  ops       — positional encoding, samplers, volume compositing, pallas kernels
  geo       — geodesy (ECEF/UTM), RPC camera models, ray generation
  brdf      — RPV / Hapke / Microfacet physics
  models    — functional MLP model families (params-as-pytrees)
  render    — the fused render_rays step
  data      — dataset ingestion (blender synthetic + satellite RGB/depth)
  parallel  — device mesh + sharded train/render steps
  utils     — checkpointing, numerics guards, image metrics helpers
"""

__version__ = "0.1.0"
