from diligentfx_tpu.postfx import tonemap as tonemap
