"""Job-spec configuration helpers: path DSL + ``${var}`` substitution.

Reference: DataX's ``Configuration`` (common/src/main/java/com/alibaba/
datax/common/util/Configuration.java, ~1078 LoC) exposes ``a.b[0].c``
path getters/setters over the merged job JSON, and the Engine accepts
``-p "-Dkey=value"`` parameters that substitute ``${key}`` occurrences in
the job file before parsing (core/.../Engine.java arg handling +
ConfigParser). Jobs in the wild lean on ``${bizdate}``-style variables
for partition names and paths.

Here the same two conveniences over plain-dict specs, deliberately tiny:
the full dynamic merge machinery stays dropped (the CLI takes one JSON
file), but user specs keep their ``${var}`` holes and tools can address
nested values without hand-walking dicts."""

from __future__ import annotations

import re
from typing import Any

_SEG = re.compile(r"([^.\[\]]+)|\[(\d+)\]")
_VAR = re.compile(r"\$\{([A-Za-z_][A-Za-z0-9_]*)\}")

_MISSING = object()


def _segments(path: str) -> list[str | int]:
    segs: list[str | int] = []
    pos = 0
    for m in _SEG.finditer(path):
        if m.start() > pos and path[pos:m.start()].strip("."):
            raise ValueError(f"bad config path: {path!r}")
        segs.append(int(m.group(2)) if m.group(2) is not None else m.group(1))
        pos = m.end()
    if not segs:
        raise ValueError(f"bad config path: {path!r}")
    return segs


def path_get(obj: Any, path: str, default: Any = None) -> Any:
    """``path_get(spec, "job.content.reader.parameter.path")`` — dict keys
    dotted, list indices bracketed (``transformer[0].name``)."""
    cur = obj
    for seg in _segments(path):
        if isinstance(seg, int):
            if not isinstance(cur, list) or seg >= len(cur):
                return default
            cur = cur[seg]
        else:
            if not isinstance(cur, dict) or seg not in cur:
                return default
            cur = cur[seg]
    return cur


def path_set(obj: Any, path: str, value: Any) -> Any:
    """Set a nested value, creating intermediate dicts (and extending
    lists with ``{}``) as needed; returns ``obj``."""
    segs = _segments(path)
    cur = obj
    for i, seg in enumerate(segs):
        last = i == len(segs) - 1
        if isinstance(seg, int):
            if not isinstance(cur, list):
                raise TypeError(f"segment [{seg}] of {path!r}: not a list")
            while len(cur) <= seg:
                cur.append({})
            if last:
                cur[seg] = value
            else:
                cur = cur[seg]
        else:
            if not isinstance(cur, dict):
                raise TypeError(f"segment {seg!r} of {path!r}: not a dict")
            if last:
                cur[seg] = value
            else:
                nxt = segs[i + 1]
                cur = cur.setdefault(seg, [] if isinstance(nxt, int) else {})
    return obj


def substitute_params(text: str, params: dict[str, str],
                      strict: bool = False) -> str:
    """Replace ``${key}`` holes in a raw job-spec string with ``-p``
    parameters — DataX's variable substitution. Unknown keys are left as
    literal ``${key}`` text (warned), matching the reference's
    ``StrUtil.replaceVariable`` which never rejects at parse time — a job
    spec may legitimately carry ``${...}`` in DATA (e.g. a dx_replace
    replacement string). Pass ``strict=True`` to fail instead."""
    missing: set[str] = set()

    def repl(m: re.Match) -> str:
        k = m.group(1)
        if k in params:
            return str(params[k])
        missing.add(k)
        return m.group(0)

    out = _VAR.sub(repl, text)
    if missing:
        if strict:
            raise KeyError(
                f"job spec has unfilled ${{...}} variables: {sorted(missing)}; "
                "pass them with -p key=value"
            )
        import warnings

        warnings.warn(
            f"job spec has unfilled ${{...}} variables left as literal text: "
            f"{sorted(missing)}",
            stacklevel=2,
        )
    return out
