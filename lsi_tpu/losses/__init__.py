from lsi_tpu.losses.losses import (  # noqa: F401
    total_loss,
    view_synthesis_inverse_warp,
    view_synthesis_splat,
    disparity_smoothness,
    depth_supervision,
)
