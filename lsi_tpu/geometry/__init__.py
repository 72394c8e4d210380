from lsi_tpu.geometry import projection, transforms, homography  # noqa: F401
from lsi_tpu.geometry.ldi import LDI  # noqa: F401
