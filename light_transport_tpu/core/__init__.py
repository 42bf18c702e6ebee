from light_transport_tpu.core import config, math, rng  # noqa: F401
