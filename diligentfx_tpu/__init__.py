"""diligentfx_tpu — a TPU-native real-time rendering framework.

A from-scratch rebuild of the capabilities of DiligentGraphics/DiligentFX
(physically-based glTF rendering, IBL, cascaded shadow maps, the full
post-processing stack, a Hydra-style frame task graph, and an engine-style
scene/asset API) designed for TPU hardware: rasterization, shading, and all
screen-space effects are JAX/XLA/Pallas programs over HBM-resident
framebuffer tensors; multi-chip scaling shards the framebuffer tile grid over
a `jax.sharding.Mesh` with ICI halo exchange.

There is no graphics API underneath: the resource-binding layer of the
reference (pipeline states, SRBs, constant buffers) is replaced by frozen
config dataclasses (jit cache keys) and pytrees of arrays.
"""

__version__ = "0.1.0"

from diligentfx_tpu import config as config
from diligentfx_tpu import math3d as math3d
from diligentfx_tpu import attribs as attribs
