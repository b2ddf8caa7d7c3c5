"""Persistent precompute cache — the analogue of IRenderStateCache disk
persistence (SURVEY.md §5.4): the reference can persist compiled PSOs across
runs; here the expensive startup artifacts are the IBL precompute products
(BRDF LUT, irradiance SH, prefiltered env chain) and JAX's own compilation
cache (enabled separately via JAX_COMPILATION_CACHE_DIR)."""
from __future__ import annotations

import os
from typing import Optional

import numpy as np


def save_ibl_maps(path: str, maps) -> None:
    import jax
    arrays = {}
    arrays["irradiance"] = np.asarray(maps.irradiance)
    arrays["preintegrated_ggx"] = np.asarray(maps.preintegrated_ggx)
    arrays["preintegrated_charlie"] = np.asarray(maps.preintegrated_charlie)
    arrays["sheen_albedo_scaling"] = np.asarray(maps.sheen_albedo_scaling)
    arrays["irradiance_sh"] = np.asarray(maps.irradiance_sh)
    arrays["pref_flat"] = np.asarray(maps.pref_flat)
    arrays["pref_offsets"] = np.asarray(maps.pref_offsets)
    arrays["pref_sizes"] = np.asarray(maps.pref_sizes)
    if maps.env_brdf_coeffs is not None:
        arrays["env_brdf_coeffs"] = np.asarray(maps.env_brdf_coeffs)
    arrays["n_mips"] = np.asarray(len(maps.prefiltered))
    for i, m in enumerate(maps.prefiltered):
        arrays[f"pref_{i}"] = np.asarray(m)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez_compressed(path, **arrays)


def load_ibl_maps(path: str):
    import jax.numpy as jnp
    from diligentfx_tpu.pbr.shading import IBLMaps
    if not os.path.exists(path):
        return None
    try:
        from diligentfx_tpu.ops.sampling import build_packed_pyramid
        z = np.load(path)
        n = int(z["n_mips"])
        pref = tuple(jnp.asarray(z[f"pref_{i}"]) for i in range(n))
        return IBLMaps(
            irradiance=jnp.asarray(z["irradiance"]),
            prefiltered=pref,
            preintegrated_ggx=jnp.asarray(z["preintegrated_ggx"]),
            preintegrated_charlie=jnp.asarray(z["preintegrated_charlie"]),
            sheen_albedo_scaling=jnp.asarray(z["sheen_albedo_scaling"]),
            irradiance_sh=jnp.asarray(z["irradiance_sh"]),
            pref_flat=jnp.asarray(z["pref_flat"]),
            pref_offsets=jnp.asarray(z["pref_offsets"]),
            pref_sizes=jnp.asarray(z["pref_sizes"]),
            env_brdf_coeffs=(jnp.asarray(z["env_brdf_coeffs"])
                             if "env_brdf_coeffs" in z.files else None),
            # derived, not serialized: rebuild from the mips (cheap)
            pref_packed=build_packed_pyramid(pref),
        )
    except Exception:
        return None


def ibl_cache_key(env_oct, ci) -> str:
    """Content hash of the env map + precompute dims."""
    from diligentfx_tpu.native.binding import content_hash
    h = content_hash(np.asarray(env_oct),
                     np.asarray([ci.brdf_lut_dim, ci.num_brdf_samples,
                                 ci.irradiance_cube_dim,
                                 ci.prefiltered_env_map_dim,
                                 ci.num_specular_env_samples], np.int64))
    return h.hex()
