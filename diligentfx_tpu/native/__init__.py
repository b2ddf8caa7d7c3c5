from diligentfx_tpu.native import binding as binding
