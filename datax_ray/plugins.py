"""Reader/Writer plugin SPI — the user-extension surface.

DataX loads reader/writer plugins from plugin.json descriptors into a
registry keyed by name (dataxPluginDev.md:55-140; LoadUtil). Here the same
extension point is two plain registries + decorators; the CLI's
``_build_reader`` / ``_run_writer`` fall back to them for any name they
don't know natively, so a job JSON can reference user plugins exactly like
built-ins:

    @register_source("my_reader")
    def my_reader(parameter: dict) -> ray.data.Dataset: ...

    @register_sink("my_writer")
    def my_writer(parameter: dict, ds, resume: bool) -> dict: ...

Job-level ``preHandler`` / ``postHandler`` (JobContainer.java:312-378 —
plugin hooks that may rewrite the job configuration before run and
inspect it after) are ``"module:function"`` strings in ``job.setting``:
preHandler(spec) may return a modified spec; postHandler(spec, report)
runs after the job, before the Hook SPI.
"""

from __future__ import annotations

import importlib
from typing import Any, Callable

SOURCE_REGISTRY: dict[str, Callable[[dict], Any]] = {}
SINK_REGISTRY: dict[str, Callable[..., dict]] = {}


def register_source(name: str, fn: Callable | None = None):
    def deco(f):
        SOURCE_REGISTRY[name] = f
        return f

    return deco(fn) if fn is not None else deco


def register_sink(name: str, fn: Callable | None = None):
    def deco(f):
        SINK_REGISTRY[name] = f
        return f

    return deco(fn) if fn is not None else deco


def resolve_handler(spec: str) -> Callable:
    """``"module:function"`` → callable — THE single implementation of the
    convention shared by hooks, pre/post handlers and dx_python."""
    mod, sep, fn = spec.partition(":")
    if not sep or not mod or not fn:
        raise ValueError(
            f"expected 'module:function', got {spec!r}"
        )
    return getattr(importlib.import_module(mod), fn)
