from diligentfx_tpu.pbr import brdf as brdf
from diligentfx_tpu.pbr import shading as shading
from diligentfx_tpu.pbr import ibl as ibl
