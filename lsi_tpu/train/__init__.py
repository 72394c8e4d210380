from lsi_tpu.train.trainer import Trainer, make_train_step  # noqa: F401
