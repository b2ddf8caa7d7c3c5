"""GBuffer container — the analogue of Components/GBuffer
(interface/GBuffer.hpp:40-68): a named set of render targets with per-element
format/clear-value and resize semantics.  On TPU a "render target" is just an
array; this class manages the named set, dtype policy, clear values, and
re-allocation on resize."""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax.numpy as jnp


@dataclass(frozen=True)
class GBufferElementDesc:
    """GBuffer::ElementDesc analogue: channels + dtype + clear value."""
    channels: int
    dtype: str = "float32"
    clear_value: float = 0.0


class GBuffer:
    def __init__(self, elements: Dict[str, GBufferElementDesc]):
        self._descs = dict(elements)
        self._buffers: Dict[str, jnp.ndarray] = {}
        self._size: Tuple[int, int] = (0, 0)

    @property
    def size(self) -> Tuple[int, int]:
        return self._size

    def resize(self, width: int, height: int) -> None:
        """(Re)allocate all elements (GBuffer::Resize). No-op if unchanged."""
        if self._size == (width, height) and self._buffers:
            return
        self._size = (width, height)
        self._buffers = {}
        for name, d in self._descs.items():
            shape = (height, width) if d.channels == 1 else (height, width, d.channels)
            self._buffers[name] = jnp.full(shape, d.clear_value,
                                           jnp.dtype(d.dtype))

    def __getitem__(self, name: str):
        return self._buffers[name]

    def __setitem__(self, name: str, value) -> None:
        d = self._descs[name]
        expect = ((self._size[1], self._size[0]) if d.channels == 1
                  else (self._size[1], self._size[0], d.channels))
        if tuple(value.shape) != expect:
            raise ValueError(f"{name}: shape {value.shape} != {expect}")
        self._buffers[name] = value

    def clear(self, name: Optional[str] = None) -> None:
        names = [name] if name else list(self._descs)
        for n in names:
            d = self._descs[n]
            self._buffers[n] = jnp.full_like(self._buffers[n], d.clear_value)

    def names(self):
        return list(self._descs)


def make_frame_render_targets(width: int, height: int) -> GBuffer:
    """The HnFrameRenderTargets set (interface/HnFrameRenderTargets.hpp:42-52)."""
    g = GBuffer({
        "scene_color": GBufferElementDesc(3),
        "mesh_id": GBufferElementDesc(1, "int32", -1),
        "motion_vectors": GBufferElementDesc(2),
        "normal": GBufferElementDesc(3),
        "base_color": GBufferElementDesc(3),
        "material_data": GBufferElementDesc(3),
        "ibl": GBufferElementDesc(3),
        "depth": GBufferElementDesc(1, "float32", 1.0),
        "selection_depth": GBufferElementDesc(1, "float32", 1.0),
    })
    g.resize(width, height)
    return g
