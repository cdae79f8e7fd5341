"""dad3dheads_tpu — a TPU-native (JAX/XLA/Pallas/pjit) monocular image ->
3D head alignment framework with the capabilities of DAD-3DHeads.

Layers (bottom-up):
  assets      static data store (topology, embeddings, FLAME arrays)
  core        FLAME decode, landmarks, projection, head-mesh facade
  ops         Pallas TPU kernels + XLA reference paths (hot ops)
  models      DAD-3DNet (ResNet/MobileNet + BiFPN + heads) in flax
  data        dataset, bbox/crop, heatmap targets, host->device pipeline
  losses      IoU / 3D vertices / reprojection / landmark losses, LossModule
  metrics     NME, failure rate, soft IoU (collective-friendly)
  train       optax optimizers/schedulers, pjit train step, checkpoints, loop
  parallel    device mesh + sharding helpers
  render      z-buffer rasterizer (XLA + native C++), lighting, PNCC
  api         FaceMeshPredictor + demo processors/savers
  cli         demo / train / visualize / benchmark entry points
  benchmark_harness  DAD-3DHeads evaluation protocol (NME, Chamfer, Z_n, pose)
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("DAD3D_PLATFORM"):
    # The environment's TPU plugin prepends itself to JAX_PLATFORMS, so that
    # env var alone cannot force CPU; this knob can (e.g. DAD3D_PLATFORM=cpu).
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["DAD3D_PLATFORM"])

