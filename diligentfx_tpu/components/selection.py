"""Selection outline via jump-flood — the analogue of Hydrogent's
HnProcessSelectionTask (src/Tasks/HnProcessSelectionTask.cpp, shaders
HnClosestSelectedLocation.fxh): log2(max(W,H)) jump-flood passes propagate the
closest selected pixel location, from which the composite pass draws a
distance-based outline (HnPostProcess.psh selection outline term)."""
from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def closest_selected_location(selected: Array) -> Array:
    """Jump flood: selected (H, W) bool → (H, W, 2) float pixel coords of the
    closest selected pixel (inf where none)."""
    h, w = selected.shape
    xg = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    yg = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    inf = jnp.float32(1e9)
    loc = jnp.where(selected[..., None],
                    jnp.stack([xg, yg], axis=-1),
                    jnp.full((h, w, 2), inf))

    def dist2(l):
        return (l[..., 0] - xg) ** 2 + (l[..., 1] - yg) ** 2

    steps = int(math.ceil(math.log2(max(h, w))))
    for i in range(steps):
        step = 1 << (steps - 1 - i)
        best = loc
        best_d = dist2(loc)
        for dy in (-step, 0, step):
            for dx in (-step, 0, step):
                if dx == 0 and dy == 0:
                    continue
                cand = jnp.roll(loc, (dy, dx), axis=(0, 1))
                # rolled-in garbage from wraparound: reject by validity range
                cx = cand[..., 0]
                cy = cand[..., 1]
                ok = (cx < 1e8) & (cy < 1e8)
                d = jnp.where(ok, dist2(cand), jnp.inf)
                take = d < best_d
                best = jnp.where(take[..., None], cand, best)
                best_d = jnp.minimum(d, best_d)
        loc = best
    return loc


def selection_outline(color: Array, selected: Array, *,
                      outline_width: float = 3.0,
                      outline_color=(1.0, 0.6, 0.1),
                      occluded_factor: float = 0.4) -> Array:
    """Composite a distance-band outline around the selection
    (HnPostProcess.psh selection term)."""
    h, w = selected.shape
    loc = closest_selected_location(selected)
    xg = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    yg = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    d = jnp.sqrt((loc[..., 0] - xg) ** 2 + (loc[..., 1] - yg) ** 2)
    band = (d > 0.5) & (d <= outline_width) & ~selected
    oc = jnp.asarray(outline_color, jnp.float32)
    alpha = jnp.where(band, 1.0, 0.0)[..., None]
    return color + (oc - color) * alpha


def desaturate_unselected(color: Array, selected: Array,
                          desaturation: float = 0.7) -> Array:
    """HnPostProcess.psh non-selection desaturation term."""
    from diligentfx_tpu.math3d import luminance
    lum = luminance(color)
    gray = jnp.broadcast_to(lum, color.shape)
    des = color + (gray - color) * desaturation
    return jnp.where(selected[..., None], color, des)
