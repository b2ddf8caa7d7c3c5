"""Multi-chip rendering over a jax.sharding.Mesh.

The reference has no distributed backend (SURVEY.md §5.8: the only hook is the
dormant RADIENT_BACKEND_TYPE_REMOTE stub, RadientTypes.h:45-51).  The
TPU-native scaling model is:

  * **dp** (data parallel): independent frames/views — a batch of cameras
    (multi-view render, animation frames, or inverse-rendering batches).
  * **sp** (spatial / "sequence" parallel): the framebuffer's tile-row axis —
    each device rasterizes and shades its horizontal band of the image.  This
    is the renderer's analogue of sequence/context parallelism (SURVEY.md
    §5.7): the long dimension is the pixel grid.  Screen-space neighborhoods
    (SSR/SSAO/TAA kernels) use halo exchange (`ppermute`) between adjacent
    bands.

Geometry and materials are replicated (they are small relative to
framebuffers); binning is computed per device for its own band, so no
triangle-level communication is needed — rasterization is embarrassingly
parallel over bands, like the reference's GPU SIMT rasterizer over tiles.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Array = jax.Array


def make_render_mesh(n_devices: Optional[int] = None, dp: Optional[int] = None,
                     sp: Optional[int] = None, devices=None) -> Mesh:
    """Create a ('dp', 'sp') mesh.  Defaults: dp = n//4 (min 1), sp = rest."""
    if devices is None:
        devices = jax.devices()[: (n_devices or len(jax.devices()))]
    n = len(devices)
    if dp is None or sp is None:
        sp = sp or min(4, n)
        dp = dp or n // sp
    assert dp * sp == n, (dp, sp, n)
    arr = np.asarray(devices).reshape(dp, sp)
    return Mesh(arr, ("dp", "sp"))


def band_halo_exchange(band: Array, halo: int, axis_name: str = "sp",
                       wrap: bool = False) -> Array:
    """Exchange `halo` rows with the neighboring devices along the sp axis and
    return the band padded to (h + 2*halo, ...).  Use inside shard_map for
    screen-space filters that cross band boundaries.

    wrap=False: devices at the image edge receive zero pads (ppermute's
    missing-source semantics) — callers usually overwrite these with the
    edge rows (edge-clamp, `bilinear_sample` semantics).
    wrap=True: a full ring — band 0's top halo is the LAST band's bottom
    rows, which is exactly `jnp.roll`'s global wrap, so halo'd 3×3 windows
    reproduce the monolithic frame's roll-based filters bit-exactly."""
    n = jax.lax.axis_size(axis_name)
    # My bottom rows become the device below's top halo, and vice versa.
    down = [(i, (i + 1) % n) for i in range(n if wrap else n - 1)]
    up = [((i + 1) % n, i) for i in range(n if wrap else n - 1)]
    from_above = jax.lax.ppermute(band[-halo:], axis_name, down)
    from_below = jax.lax.ppermute(band[:halo], axis_name, up)
    return jnp.concatenate([from_above, band, from_below], axis=0)


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def band_sharding(mesh: Mesh):
    """Shard the leading (height) dim of an image over sp, batch over dp."""
    return NamedSharding(mesh, P("dp", "sp"))
