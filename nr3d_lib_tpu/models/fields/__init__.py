"""Field models: SDF / NeuS / NeRF nets + renderable models
(reference: nr3d_lib/models/fields/)."""

from nr3d_lib_tpu.models.fields.nerf import LoTDNeRF, MlpNeRF, RadianceNet  # noqa: F401
from nr3d_lib_tpu.models.fields.sdf import LoTDSDF, MlpSDF  # noqa: F401
from nr3d_lib_tpu.models.fields.neus import LoTDNeuS, get_neus_var_ctrl  # noqa: F401
