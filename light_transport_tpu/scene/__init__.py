from light_transport_tpu.scene.material import (  # noqa: F401
    BSDF_DIFFUSE,
    BSDF_MIRROR,
    BSDF_NONE,
    BSDF_TRANSMISSIVE,
    Color,
    Material,
    MaterialTable,
    presets,
)
from light_transport_tpu.scene.geometry import TriangleMesh  # noqa: F401
from light_transport_tpu.scene.lights import LightTable  # noqa: F401
from light_transport_tpu.scene.scene import Scene  # noqa: F401
from light_transport_tpu.scene.cornell import cornell_box_scene  # noqa: F401
from light_transport_tpu.scene.medium import LayeredMedium  # noqa: F401
