from phenaki_tpu.utils.logging import MetricLogger, accum_log
from phenaki_tpu.utils.image_grid import save_image_grid
from phenaki_tpu.utils.jit_init import jit_init

__all__ = ["MetricLogger", "accum_log", "save_image_grid", "jit_init"]
