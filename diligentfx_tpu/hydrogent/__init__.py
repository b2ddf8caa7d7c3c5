from diligentfx_tpu.hydrogent import task_manager as task_manager
