"""Transform registry — the user-extension surface.

DataX loads native transformers into a static registry and external ones
from $DATAX_HOME/local_storage/transformer/ jars, with the rule that user
names must not start with ``dx_`` (TransformerRegistry.java:28-108). Here:
a plain dict of constructors + a decorator; job specs reference transforms
by name with kwargs, e.g.::

    {"name": "dx_substr", "parameter": {"column": "text", "start": 0, "length": 10}}
"""

from __future__ import annotations

from typing import Any, Callable

from datax_ray.transforms.dx import (
    DxFilter,
    DxPad,
    DxPython,
    DxReplace,
    DxSubstr,
    Transform,
)

def _resolve_fn(fn) -> Callable:
    """Accept a live callable OR a ``"module:function"`` string so dx_python
    is reachable from a plain JSON job spec — the escape hatch dx_groovy
    gives DataX users by embedding code in the job file
    (GroovyTransformer.java:24-88). Same convention as setting.hooks."""
    if callable(fn):
        return fn
    if isinstance(fn, str) and ":" in fn:
        from datax_ray.plugins import resolve_handler

        return resolve_handler(fn)
    raise TypeError(
        f"dx_python fn must be a callable or 'module:function' string, got {fn!r}"
    )


_REGISTRY: dict[str, Callable[..., Transform]] = {
    "dx_substr": lambda column, start, length, **_: DxSubstr(column, int(start), int(length)),
    "dx_pad": lambda column, pad_type, length, pad_string, **_: DxPad(
        column, pad_type, int(length), pad_string
    ),
    "dx_replace": lambda column, start, length, replace_string, **_: DxReplace(
        column, int(start), int(length), replace_string
    ),
    "dx_filter": lambda column, op, value, **_: DxFilter(column, op, value),
    "dx_python": lambda fn, **_: DxPython(_resolve_fn(fn)),
}


def _make_lookup(key, path=None, table=None, dimKey=None, columns=None,
                 required=False, **_):
    from datax_ray.transforms.lookup import Lookup

    src = table if table is not None else path
    if src is None:
        raise ValueError("lookup needs 'path' or 'table'")
    return Lookup(src, key, dim_key=dimKey, columns=columns,
                  required=bool(required))


# broadcast dimension enrichment — a user-named transform (no dx_ prefix:
# it has no reference counterpart; DataX chains are strictly per-record)
_REGISTRY["lookup"] = _make_lookup


def register_transform(name: str, constructor: Callable[..., Transform] | None = None):
    """Register a custom transform. User names must not start with ``dx_``
    (same rule as TransformerRegistry.java:148-164)."""

    def deco(ctor):
        if name.startswith("dx_") and name not in _REGISTRY:
            raise ValueError(f"user transform name can't start with dx_: {name}")
        _REGISTRY[name] = ctor
        return ctor

    return deco(constructor) if constructor is not None else deco


def build_transform(spec: dict[str, Any]) -> Transform:
    name = spec["name"]
    if name not in _REGISTRY:
        raise KeyError(f"unknown transform: {name}")
    params = spec.get("parameter", {})
    return _REGISTRY[name](**params)
