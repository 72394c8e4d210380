from lsi_tpu.data.pipeline import Batch, make_dataset  # noqa: F401
