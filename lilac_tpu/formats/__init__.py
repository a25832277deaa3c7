from lilac_tpu.formats.sparse import COO, CSR, ELL, BSR, SlicedELL, BucketELL  # noqa: F401
from lilac_tpu.formats import convert  # noqa: F401
