from lsi_tpu.kernels.splat_pallas import splat_pallas  # noqa: F401
