from lsi_tpu.utils.helpers import (  # noqa: F401
    divide_safe,
    flatten_layers,
    unflatten_layers,
    log_stable_exp_weight,
)
