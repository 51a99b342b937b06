from bfsr_tpu.utils.coords import make_coord, make_cell, to_pixel_samples
from bfsr_tpu.utils.misc import Averager, Timer, time_text, compute_num_params, log, set_log_path
from bfsr_tpu.utils.metrics import calc_psnr, calculate_ssim

__all__ = [
    "make_coord", "make_cell", "to_pixel_samples",
    "Averager", "Timer", "time_text", "compute_num_params", "log", "set_log_path",
    "calc_psnr", "calculate_ssim",
]
