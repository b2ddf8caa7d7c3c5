from diligentfx_tpu.ops import raster as raster
