from diligentfx_tpu.utils import image as image
