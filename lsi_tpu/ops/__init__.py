from lsi_tpu.ops.gather import bilinear_sample  # noqa: F401
from lsi_tpu.ops.splat import splat_bilinear  # noqa: F401
