from diligentfx_tpu.parallel import mesh as mesh
