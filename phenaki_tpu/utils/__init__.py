from phenaki_tpu.utils.logging import MetricLogger, accum_log
from phenaki_tpu.utils.image_grid import save_image_grid

__all__ = ["MetricLogger", "accum_log", "save_image_grid"]
