from nr3d_lib_tpu.ops.permuto import (  # noqa: F401
    PermutoEncMeta, make_permuto_meta, permuto_encode,
    permuto_enc_fwd_dydx, permuto_enc_bwd_dydx)
from nr3d_lib_tpu.models.grid_encodings.permuto.permuto_encoding import (  # noqa: F401
    PermutoEncoding)
