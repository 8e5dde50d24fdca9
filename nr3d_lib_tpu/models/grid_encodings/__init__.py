"""Grid encodings: LoTD + permutohedral (reference: nr3d_lib/models/grid_encodings/)."""

from nr3d_lib_tpu.models.grid_encodings.utils import (  # noqa: F401
    get_multires_decoder, gridsample1d, trilinear_interp)
from nr3d_lib_tpu.models.grid_encodings.lotd.lotd_cfg import (  # noqa: F401
    auto_ngp_cfg, auto_ngp4d_cfg, get_lotd_cfg)
