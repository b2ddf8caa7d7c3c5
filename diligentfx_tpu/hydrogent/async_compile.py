"""Async pipeline compilation with fallback execution — the analogue of the
reference's async shader compilation: HnRenderPass serves a FALLBACK PSO
until the real one is ready (EXECUTE_RESULT_FALLBACK, HnRenderPass
interface:114-120) and the task context suspends TAA supersampling while
fallbacks are in flight (HnRenderRprimsTask.cpp:154-156), resuming
accumulation once the final pipeline lands.

TPU translation: the "PSO" is the jitted frame program.  The full-quality
frame XLA program can take tens of seconds to compile on first use; this
wrapper AOT-compiles it in a background thread while frames are served by a
cheaper fallback configuration (fewer effects → much smaller program), then
swaps in the compiled full pipeline and resets TAA history so accumulation
restarts clean (the HnTaskManager "suspend super-sampling" behavior,
HnTaskManager.hpp:248-252).
"""
from __future__ import annotations

import dataclasses
import enum
import threading
from typing import Optional

import jax
import jax.numpy as jnp

from diligentfx_tpu.hydrogent.task_manager import (FrameOutput, FrameSettings,
                                                   HnTaskManager,
                                                   TaskManagerCreateInfo)


class ExecuteResult(enum.IntEnum):
    """EXECUTE_RESULT_* (HnRenderPass interface:114-120)."""
    OK = 0
    FALLBACK = 1      # frame rendered with the fallback pipeline
    SKIPPED = 2


def _fallback_ci(ci: TaskManagerCreateInfo) -> TaskManagerCreateInfo:
    """Cheap pipeline served while the real one compiles: heavy stochastic
    effects off (they're also the ones that need temporal history, which the
    swap resets anyway); tone map + bloom keep the image presentable."""
    return dataclasses.replace(
        ci, enable_ssr=False, enable_ssao=False, enable_dof=False,
        enable_taa=False, enable_light_scattering=False)


class AsyncFramePipeline:
    """Wraps HnTaskManager: `execute` never blocks on the full-pipeline
    compile; returns (FrameOutput, ExecuteResult)."""

    def __init__(self, renderer, ci: TaskManagerCreateInfo, *, width: int,
                 height: int, atlas=None,
                 settings: FrameSettings = FrameSettings(),
                 loading_overlay: bool = True):
        self.width, self.height = width, height
        self.settings = settings
        self.loading_overlay = loading_overlay
        self.full = HnTaskManager(renderer, ci, atlas=atlas)
        self.fallback = HnTaskManager(renderer, _fallback_ci(ci), atlas=atlas)
        self._ready = threading.Event()
        self._error: Optional[BaseException] = None
        self._thread: Optional[threading.Thread] = None
        self._swapped = False

    # -- background compile ---------------------------------------------------

    def start_compile(self, scene, info) -> None:
        """Kick off the full-pipeline compile (idempotent).  JAX compilation
        releases the GIL while XLA runs, so fallback frames proceed."""
        if self._thread is not None:
            return

        def work():
            try:
                state = self.full.initial_state(self.width, self.height)
                # tracing + XLA compile happen inside; the result is cached
                # by jit for the real execute() call
                out = self.full.execute(scene, info, state,
                                        width=self.width, height=self.height,
                                        settings=self.settings)
                jax.block_until_ready(out.color)
            except BaseException as e:   # surfaced on the main thread
                self._error = e
            finally:
                self._ready.set()

        self._thread = threading.Thread(target=work, daemon=True,
                                        name="dfx-async-compile")
        self._thread.start()

    @property
    def full_ready(self) -> bool:
        return self._ready.is_set() and self._error is None

    # -- frame execution -------------------------------------------------------

    def execute(self, scene, info, state=None):
        """Render one frame.  Uses the fallback pipeline until the full one
        has compiled; on the first full-quality frame the temporal state is
        re-initialized (TAA supersampling resumes from scratch)."""
        if self._error is not None:
            raise self._error
        if self._thread is None:
            self.start_compile(scene, info)
        if self.full_ready:
            if not self._swapped or state is None:
                state = self.full.initial_state(self.width, self.height)
                self._swapped = True
            out = self.full.execute(scene, info, state, width=self.width,
                                    height=self.height,
                                    settings=self.settings)
            return out, ExecuteResult.OK
        if state is None or self._swapped:
            # (re-)enter fallback (e.g. first frames): fallback state shape
            self._swapped = False
            state = self.fallback.initial_state(self.width, self.height)
        out = self.fallback.execute(scene, info, state, width=self.width,
                                    height=self.height,
                                    settings=self.settings)
        if self.loading_overlay:
            # subtle streaming indicator (GetLoadingAnimationColor analogue)
            from diligentfx_tpu.postfx.tonemap import loading_animation
            t = out.state.frame_index.astype(jnp.float32) / 30.0
            out = out._replace(color=loading_animation(out.color, 0.15, t))
        return out, ExecuteResult.FALLBACK
