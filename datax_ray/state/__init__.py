from datax_ray.state.manifest import Manifest  # noqa: F401
