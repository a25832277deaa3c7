from lilac_tpu.ops import dfloat  # noqa: F401
from lilac_tpu.ops.spmv import spmv  # noqa: F401
