from light_transport_tpu.integrators.adaptive import (  # noqa: F401
    render_adaptive,
)
from light_transport_tpu.integrators.path_tracer import (  # noqa: F401
    camera_rays,
    render_image,
    trace_paths,
)
