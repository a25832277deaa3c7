from lilac_tpu.workloads import npb_cg  # noqa: F401
