from twotowermlretrieval_tpu.utils.dtypes import matmul_precision  # noqa: F401
