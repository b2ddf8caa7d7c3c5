from diligentfx_tpu.postfx import tonemap as tonemap
from diligentfx_tpu.postfx import context as context
from diligentfx_tpu.postfx import taa as taa
from diligentfx_tpu.postfx import bloom as bloom
from diligentfx_tpu.postfx import ssao as ssao
from diligentfx_tpu.postfx import ssr as ssr
from diligentfx_tpu.postfx import dof as dof
