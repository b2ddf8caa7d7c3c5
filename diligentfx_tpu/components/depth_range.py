"""Depth-range reduction — the analogue of Components/DepthRangeCalculator
(interface/DepthRangeCalculator.hpp:43-57, ComputeDepthRange.csh): min/max
scene depth reduced into {SceneNearZ, SceneFarZ, SceneNearDepth, SceneFarDepth},
feeding cascade fitting (AdjustCascadeRange) and the depth debug view.

The GPU compute-shader tree reduction becomes a single jnp masked reduce."""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from diligentfx_tpu.attribs import CameraAttribs
from diligentfx_tpu.postfx.context import depth_to_camera_z

Array = jax.Array


class DepthRange(NamedTuple):
    """DepthRangeCalculator::DepthRange analogue."""
    scene_near_z: Array      # () view-space distance of nearest sample
    scene_far_z: Array
    scene_near_depth: Array  # () NDC depth extrema
    scene_far_depth: Array


def compute_depth_range(depth: Array, camera: CameraAttribs,
                        background_depth: float = 1.0,
                        reversed_z: bool = False) -> DepthRange:
    """Masked min/max over non-background pixels (ComputeDepthRange.csh)."""
    valid = depth != background_depth
    any_valid = jnp.any(valid)
    big = jnp.float32(1.0 if not reversed_z else 0.0)
    small = jnp.float32(0.0 if not reversed_z else 1.0)
    dmin = jnp.min(jnp.where(valid, depth, big))
    dmax = jnp.max(jnp.where(valid, depth, small))
    dmin = jnp.where(any_valid, dmin, small)
    dmax = jnp.where(any_valid, dmax, big)
    near_d, far_d = (dmax, dmin) if reversed_z else (dmin, dmax)
    return DepthRange(
        scene_near_z=depth_to_camera_z(near_d, camera, reversed_z),
        scene_far_z=depth_to_camera_z(far_d, camera, reversed_z),
        scene_near_depth=near_d,
        scene_far_depth=far_d,
    )
