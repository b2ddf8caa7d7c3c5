"""Packed multi-light shadow-map atlas — the analogue of Hydrogent's
HnShadowMapManager (include/HnShadowMapManager.hpp:47-66: a dynamically
resized 2048² D32F texture-array atlas with one slice per shadow view) and
HnLight's per-light slice allocation (src/HnLight.cpp:699).

TPU design: the atlas is one (N_slices, S, S) f32 depth array (the array
axis IS the texture-array slice index).  A host-side free-list allocator
hands out slices as lights become shadow-casting and reclaims them when
lights are removed — 1 slice per directional (fitted ortho) or spot light,
6 consecutive logical slices per point light (cube faces).  Because jit
programs need static shapes, the atlas capacity grows in power-of-two jumps
(the analogue of the reference's Resize() re-allocating the texture array)
so recompiles happen O(log N) times, not per light.

Per-frame flow (HnRenderShadowsTask analogue):
  view_projs = atlas.build_view_projs(lights, scene_bounds)   # (N, 4, 4)
  maps       = atlas.render(world_pos, indices, view_projs)   # (N, S, S)
  kinds      = atlas.light_shadow_kinds(lights)               # static tuple
  info = info._replace(light_shadow_maps=maps[perm],
                       light_shadow_view_projs=view_projs[perm])
where `perm = atlas.light_order_slices(lights)` packs the live slices in
light order (the layout pbr.deferred's per-light dispatch consumes).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from diligentfx_tpu import math3d as m3
from diligentfx_tpu.attribs import LightType
from diligentfx_tpu.config import RasterizerConfig
from diligentfx_tpu.components import shadow_map_manager as smm

Array = jax.Array

SLICES_PER_KIND = {"dir": 1, "spot": 1, "point": 6}


def directional_view_proj(direction, bounds_min, bounds_max,
                          pad: float = 1.05) -> Array:
    """World → clip for a single fitted ortho directional-shadow slice (the
    HnLight directional path — one slice sized to the scene bounds, not the
    camera-fitted cascade chain of ShadowMapManager).  Matches the cascade
    math's light basis (basis_from_direction) so filtering conventions are
    shared."""
    bmin = jnp.asarray(bounds_min, jnp.float32)
    bmax = jnp.asarray(bounds_max, jnp.float32)
    world_to_light = smm.basis_from_direction(
        jnp.asarray(direction, jnp.float32))
    # project the 8 bound corners into light space, fit an ortho box
    corners = jnp.stack([
        jnp.where(jnp.asarray([i & 1, i & 2, i & 4]) > 0, bmax, bmin)
        for i in range(8)])
    lc = m3.transform_points(corners, world_to_light)
    lo = jnp.min(lc, axis=0)
    hi = jnp.max(lc, axis=0)
    center = (lo + hi) * 0.5
    half = jnp.maximum((hi - lo) * 0.5 * pad, 1e-3)
    # D3D ortho: z in [0, 1] over [center-half, center+half]
    scale = jnp.concatenate([1.0 / half[:2], 1.0 / (2.0 * half[2:3])])
    ortho = jnp.array([
        [1.0, 0.0, 0.0, 0.0],
        [0.0, 1.0, 0.0, 0.0],
        [0.0, 0.0, 1.0, 0.0],
        [0.0, 0.0, 0.5, 1.0],
    ], jnp.float32)
    ortho = ortho.at[0, 0].set(scale[0]).at[1, 1].set(scale[1]) \
                 .at[2, 2].set(scale[2]) \
                 .at[3, 0].set(-center[0] * scale[0]) \
                 .at[3, 1].set(-center[1] * scale[1]) \
                 .at[3, 2].set(0.5 - center[2] * scale[2])
    return m3.mul44(world_to_light, ortho)


@dataclass
class ShadowAtlasManager:
    """Slice allocator + renderer for the packed light-shadow atlas.

    Mirrors HnShadowMapManager's contract: `add_light` is the analogue of a
    light turning shadow-casting (HnLight.cpp slice allocation), `remove`
    frees its slices for reuse, and the backing capacity only grows
    (power-of-two) so the jit shape stays stable between growth events."""
    slice_size: int = 1024
    initial_slices: int = 8
    max_slices: int = 256
    _capacity: int = field(init=False, default=0)
    _free: List[int] = field(init=False, default_factory=list)
    # light id → (kind, [slice indices])
    _lights: Dict[object, Tuple[str, List[int]]] = field(
        init=False, default_factory=dict)

    def __post_init__(self):
        self._capacity = self.initial_slices
        self._free = list(range(self.initial_slices))

    # ---- allocation (host side, like the reference's CPU-side manager) ----

    @property
    def capacity(self) -> int:
        return self._capacity

    @property
    def used_slices(self) -> int:
        return self._capacity - len(self._free)

    def slices_of(self, light_id) -> Optional[List[int]]:
        ent = self._lights.get(light_id)
        return list(ent[1]) if ent is not None else None

    def add_light(self, light_id, kind: str) -> List[int]:
        """Allocate this light's slices (idempotent for a same-kind re-add).
        kind ∈ {dir, spot, point}."""
        if kind not in SLICES_PER_KIND:
            raise ValueError(f"unknown shadow kind {kind!r}")
        prev = self._lights.get(light_id)
        if prev is not None:
            if prev[0] == kind:
                return list(prev[1])
            self.remove_light(light_id)
        need = SLICES_PER_KIND[kind]
        while len(self._free) < need:
            self._grow()
        got = [self._free.pop(0) for _ in range(need)]
        self._lights[light_id] = (kind, got)
        return list(got)

    def remove_light(self, light_id) -> None:
        ent = self._lights.pop(light_id, None)
        if ent is not None:
            self._free.extend(ent[1])
            self._free.sort()

    def _grow(self) -> None:
        new_cap = min(max(self._capacity * 2, 1), self.max_slices)
        if new_cap <= self._capacity:
            raise RuntimeError(
                f"shadow atlas exhausted at {self._capacity} slices "
                f"(max_slices={self.max_slices})")
        self._free.extend(range(self._capacity, new_cap))
        self._capacity = new_cap

    # ---- per-frame products ------------------------------------------------

    def light_order(self) -> List[object]:
        """Light ids in insertion order (the per-light dispatch order)."""
        return list(self._lights.keys())

    def light_shadow_kinds(self) -> Tuple[str, ...]:
        """Static kinds tuple for pbr.deferred's per-light dispatch, in
        insertion order."""
        return tuple(kind for kind, _ in self._lights.values())

    def light_order_slices(self) -> np.ndarray:
        """Packed slice permutation: atlas slice indices in light order
        (spot/dir contribute 1, point 6 consecutive)."""
        out: List[int] = []
        for _, slices in self._lights.values():
            out.extend(slices)
        return np.asarray(out, np.int32)

    def build_view_projs(self, params: Dict[object, dict],
                         bounds_min=None, bounds_max=None) -> Array:
        """Per-slice view-proj matrices at ATLAS layout (capacity, 4, 4).

        params[light_id] carries the light description:
          dir:   {"direction"}                     (needs bounds_min/max)
          spot:  {"position", "direction", "outer_angle", ["near"], ["far"]}
          point: {"position", ["near"], ["far"]}
        Unused slices get identity matrices."""
        vps = [jnp.eye(4, dtype=jnp.float32)] * self._capacity
        for light_id, (kind, slices) in self._lights.items():
            p = params[light_id]
            if kind == "dir":
                if bounds_min is None or bounds_max is None:
                    raise ValueError("directional slices need scene bounds")
                vps[slices[0]] = directional_view_proj(
                    p["direction"], bounds_min, bounds_max)
            elif kind == "spot":
                vps[slices[0]] = smm.spot_view_proj(
                    p["position"], p["direction"], p["outer_angle"],
                    near=p.get("near", 0.05), far=p.get("far", 100.0))
            else:  # point
                faces = smm.point_view_projs(
                    p["position"], near=p.get("near", 0.05),
                    far=p.get("far", 100.0))
                for f in range(6):
                    vps[slices[f]] = faces[f]
        return jnp.stack(vps)

    def render(self, world_positions: Array, indices: Array,
               view_projs: Array, *,
               cfg: RasterizerConfig = RasterizerConfig(),
               backend: str = "auto") -> Array:
        """Depth-raster every atlas slice → (capacity, S, S).  Free slices
        render too (uniform SPMD work; their identity view-proj sees nothing
        and they cost one empty raster each) — the count is the static jit
        shape, matching the reference re-rendering its whole atlas array."""
        return smm.render_light_shadow_maps(
            world_positions, indices, view_projs,
            shadow_map_size=self.slice_size, cfg=cfg, backend=backend)

    def packed_for_lights(self, view_projs: Array, maps: Array
                          ) -> Tuple[Array, Array]:
        """Gather atlas slices into the light-ordered packed layout the
        deferred shading consumes (RenderInfo.light_shadow_maps /
        light_shadow_view_projs)."""
        perm = jnp.asarray(self.light_order_slices())
        return view_projs[perm], maps[perm]


def kinds_from_lights(lights) -> Tuple[str, ...]:
    """Derive a kinds tuple from PBRLightAttribs host-side values (all lights
    shadow-casting): DIRECTIONAL→dir, SPOT→spot, POINT→point."""
    out = []
    types = np.asarray(lights.type)
    for i in range(lights.count):
        t = int(types[i])
        if t == int(LightType.DIRECTIONAL):
            out.append("dir")
        elif t == int(LightType.SPOT):
            out.append("spot")
        else:
            out.append("point")
    return tuple(out)
