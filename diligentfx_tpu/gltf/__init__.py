from diligentfx_tpu.gltf import primitives as primitives
