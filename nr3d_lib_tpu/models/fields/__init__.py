"""Field models: SDF / NeuS / NeRF nets + renderable models
(reference: nr3d_lib/models/fields/)."""

from nr3d_lib_tpu.models.fields.nerf import LoTDNeRF, MlpNeRF, PermutoNeRF, RadianceNet  # noqa: F401
from nr3d_lib_tpu.models.fields.sdf import LoTDSDF, MlpSDF, PermutoSDF  # noqa: F401
from nr3d_lib_tpu.models.fields.neus import LoTDNeuS, PermutoNeuS, get_neus_var_ctrl  # noqa: F401
