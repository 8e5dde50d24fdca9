from nr3d_lib_tpu.ops.lotd import (  # noqa: F401
    LoDMeta, LoDType, generate_meta, lotd_encode, lotd_fwd_dydx, lotd_bwd_dydx)
from nr3d_lib_tpu.models.grid_encodings.lotd.lotd_encoding import LoTDEncoding  # noqa: F401
from nr3d_lib_tpu.models.grid_encodings.lotd.lotd_cfg import (  # noqa: F401
    get_lotd_cfg, auto_ngp_cfg)
from nr3d_lib_tpu.models.grid_encodings.lotd.lotd_brick_encoding import LoTDBrickEncoding  # noqa: F401,E501
