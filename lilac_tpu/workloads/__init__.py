from lilac_tpu.workloads import npb_cg, sparsebench  # noqa: F401
