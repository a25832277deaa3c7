from lilac_tpu.generate import npb, random_crs, stencil  # noqa: F401
