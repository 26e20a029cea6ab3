from datax_ray.transforms.dx import (  # noqa: F401
    DxFilter,
    DxPad,
    DxPython,
    DxReplace,
    DxSubstr,
)
from datax_ray.transforms.chain import TransformChain, Counters  # noqa: F401
from datax_ray.transforms.errorlimit import ErrorLimit, ErrorLimitExceeded  # noqa: F401
from datax_ray.transforms.registry import build_transform, register_transform  # noqa: F401
