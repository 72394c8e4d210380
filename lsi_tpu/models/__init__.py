from lsi_tpu.models.unet import UNet  # noqa: F401
from lsi_tpu.models.ldi_predictor import LDIPredictor  # noqa: F401

