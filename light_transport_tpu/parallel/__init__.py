from light_transport_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    render_sharded,
    simulate_sharded,
)
