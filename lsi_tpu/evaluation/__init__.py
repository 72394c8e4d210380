from lsi_tpu.evaluation.metrics import psnr, ssim, depth_metrics  # noqa: F401
from lsi_tpu.evaluation.trajectory import render_trajectory  # noqa: F401
