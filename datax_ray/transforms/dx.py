"""The dx_* transform surface, vectorized over Arrow batches.

Re-implements the documented semantics of DataX's native transformers
(reference: core/.../transport/transformer/{Substr,Pad,Replace,Filter,
Groovy}Transformer.java; doc transformer/doc/transformer.md:12-109) with
the exact null / edge rules — but as whole-column pyarrow.compute kernels
instead of per-record evaluate() calls:

- dx_substr(col, start, len)   — null passes through; start > len(s) ⇒ DIRTY
                                 (SubstrTransformer.java:44-56)
- dx_pad(col, 'l'|'r', len, p) — null treated as ""; overlong input is
                                 truncated to len (PadTransformer.java:46-60)
- dx_replace(col, start, len, s) — splice; null passes; start > len(s) ⇒
                                 DIRTY (ReplaceTransformer.java:45-57)
- dx_filter(col, op, value)    — drop row when predicate MATCHES (inverted
                                 convention!); 'like'/'not like' are
                                 full-regex matches; comparisons typed by
                                 column family (float / int+timestamp /
                                 string+bool); null rules: >,<,>=,<= never
                                 drop null; '= null' drops null; '!= null'
                                 keeps null; 'like' keeps null; 'not like'
                                 DROPS null (FilterTransformer.java:74-310)
- dx_python(fn)                — arbitrary vectorized UDF (the dx_groovy
                                 escape hatch, GroovyTransformer.java:24-88):
                                 fn(pa.Table) -> pa.Table

Each transform exposes ``dirty_mask(batch)`` (rows that would raise → the
dead-letter path) and ``apply(batch)`` (runs on clean rows only);
``drop_mask(batch)`` for filters. The chain executor routes dirty rows and
short-circuits them out of later transforms, mirroring
TransformerExchanger.java:85-115.

Unicode note: Java ``String.length()`` counts UTF-16 code units; Arrow's
utf8_* kernels count codepoints. They agree except for astral-plane chars.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_BIG = 1 << 30  # "to end of string" slice stop


def _str_len(arr):
    return pc.utf8_length(arr)


class Transform:
    """Base: a vectorized per-batch transform with dirty routing."""

    name = "transform"

    def dirty_mask(self, batch: pa.Table):
        """Rows that would raise in the reference implementation (→ dirty).
        None means 'never dirty'."""
        return None

    def drop_mask(self, batch: pa.Table):
        """Rows a filter removes (counted as filtered, not dirty)."""
        return None

    def apply(self, batch: pa.Table) -> pa.Table:
        return batch

    def error_label(self) -> str:
        return self.name


@dataclass
class DxSubstr(Transform):
    column: str
    start: int
    length: int
    name: str = "dx_substr"

    def dirty_mask(self, batch):
        s = batch[self.column]
        # start > len(s) raises in the reference; null is never dirty
        return pc.fill_null(pc.greater(pa.scalar(self.start), _str_len(s)), False)

    def apply(self, batch):
        s = batch[self.column]
        out = pc.utf8_slice_codeunits(s, self.start, self.start + self.length)
        return batch.set_column(
            batch.schema.get_field_index(self.column),
            pa.field(self.column, pa.string()),
            out.cast(pa.string()),
        )


@dataclass
class DxPad(Transform):
    column: str
    pad_type: str  # 'l' | 'r'
    length: int
    pad_string: str
    name: str = "dx_pad"

    def __post_init__(self):
        if self.pad_type.lower() not in ("l", "r"):
            raise ValueError(f"dx_pad pad type ({self.pad_type}) must be l or r")
        if not self.pad_string:
            raise ValueError("dx_pad padString must be non-empty")
        reps = -(-self.length // len(self.pad_string))  # ceil
        full = (self.pad_string * reps)[: self.length]
        # lookup table: pad text for each possible deficit 0..length
        self._pads = pa.array([full[:k] for k in range(self.length + 1)])

    def apply(self, batch):
        s = pc.fill_null(batch[self.column].cast(pa.string()), "")  # null → ""
        n = _str_len(s)
        over = pc.greater_equal(n, pa.scalar(self.length))
        truncated = pc.utf8_slice_codeunits(s, 0, self.length)
        deficit = pc.max_element_wise(
            pc.subtract(pa.scalar(self.length), n), pa.scalar(0)
        ).cast(pa.int64())
        pads = self._pads.take(deficit)
        if self.pad_type.lower() == "l":
            padded = pc.binary_join_element_wise(pads, s, "")
        else:
            padded = pc.binary_join_element_wise(s, pads, "")
        out = pc.if_else(over, truncated, padded)
        return batch.set_column(
            batch.schema.get_field_index(self.column),
            pa.field(self.column, pa.string()),
            out.cast(pa.string()),
        )


@dataclass
class DxReplace(Transform):
    column: str
    start: int
    length: int
    replace_string: str
    name: str = "dx_replace"

    def dirty_mask(self, batch):
        s = batch[self.column]
        return pc.fill_null(pc.greater(pa.scalar(self.start), _str_len(s)), False)

    def apply(self, batch):
        s = batch[self.column]
        head = pc.utf8_slice_codeunits(s, 0, self.start)
        tail = pc.utf8_slice_codeunits(s, self.start + self.length, _BIG)
        out = pc.binary_join_element_wise(head, self.replace_string, tail, "")
        # null input passes through untouched (join would keep null anyway
        # with default null_handling, but be explicit)
        out = pc.if_else(pc.is_null(s), s, out)
        return batch.set_column(
            batch.schema.get_field_index(self.column),
            pa.field(self.column, pa.string()),
            out.cast(pa.string()),
        )


@dataclass
class DxFilter(Transform):
    column: str
    op: str      # like | not like | > | < | >= | <= | = | == | !=
    value: str   # always a string in the job spec; parsed per column family
    name: str = "dx_filter"

    def __post_init__(self):
        if not self.value:
            raise ValueError("dx_filter value can't be empty")
        op = self.op.lower()
        valid = {"like", "not like", ">", "<", ">=", "<=", "=", "==", "!="}
        if op not in valid:
            raise ValueError(f"dx_filter can't support code:{self.op}")
        self.op = op

    def _family(self, typ: pa.DataType) -> str:
        if pa.types.is_floating(typ):
            return "float"
        if pa.types.is_integer(typ) or pa.types.is_timestamp(typ):
            return "int"
        return "str"  # string / binary / bool compare as strings

    def _as_str(self, col):
        if pa.types.is_boolean(col.type):
            return pc.if_else(col, "true", "false")
        return col.cast(pa.string())

    def drop_mask(self, batch):
        col = batch[self.column]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        op = self.op
        if op in ("like", "not like"):
            s = self._as_str(col)
            m = pc.match_substring_regex(s, f"^(?:{self.value})$")
            if op == "like":
                return pc.fill_null(m, False)           # null never matches → kept
            return pc.fill_null(pc.invert(m), True)     # null → DROPPED (ref rule)

        fam = self._family(col.type)
        if fam == "float":
            lhs, rhs = col.cast(pa.float64()), pa.scalar(float(self.value))
        elif fam == "int":
            lhs = col.cast(pa.int64())
            rhs = pa.scalar(int(self.value), pa.int64())
        else:
            lhs, rhs = self._as_str(col), pa.scalar(self.value)

        null_in = pc.is_null(col)
        if op in (">", ">=", "<", "<="):
            kernel = {">": pc.greater, ">=": pc.greater_equal,
                      "<": pc.less, "<=": pc.less_equal}[op]
            return pc.fill_null(kernel(lhs, rhs), False)  # null never dropped
        if op in ("=", "=="):
            if fam == "str" and self.value.lower() == "null":
                # '= null' drops nulls; non-null values still compare to "null"
                return pc.if_else(null_in, True, pc.fill_null(pc.equal(lhs, rhs), False))
            return pc.fill_null(pc.equal(lhs, rhs), self.value.lower() == "null")
        # op == '!='
        if fam == "str" and self.value.lower() == "null":
            return pc.if_else(null_in, False, pc.fill_null(pc.not_equal(lhs, rhs), True))
        return pc.fill_null(pc.not_equal(lhs, rhs), True)  # null dropped for != v


@dataclass
class DxPython(Transform):
    """Arbitrary vectorized UDF — the dx_groovy equivalent. ``fn`` is built
    once per worker (module-level function or compiled source), mirroring
    compile-once-per-task (GroovyTransformer.java:24-47)."""

    fn: Callable[[pa.Table], pa.Table]
    name: str = "dx_python"

    def apply(self, batch):
        return self.fn(batch)
