from dataflow_mm_ray.state.store import StateShard  # noqa: F401
