from diligentfx_tpu.radient import engine as engine
from diligentfx_tpu.radient import scene_state as scene_state
from diligentfx_tpu.radient import asset_manager as asset_manager
