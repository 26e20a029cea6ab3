"""MULTI_VERSION cell changelog: explode + reassemble semantics
(otsstreamreader README.md:84-127 cell-version export)."""

import numpy as np
import pyarrow as pa
import pytest

from datax_ray.cdc.cells import (
    assemble_cells,
    cell_changelog,
    explode_cells,
)


def make_events(rows):
    """rows: (lsn, op, conv, turn, role, text, tool, ts_ms)"""
    return pa.table({
        "lsn": pa.array([r[0] for r in rows], pa.int64()),
        "op": pa.array([r[1] for r in rows], pa.string()),
        "conv_id": pa.array([r[2] for r in rows], pa.string()),
        "turn_idx": pa.array([r[3] for r in rows], pa.int32()),
        "role": pa.array([r[4] for r in rows], pa.string()),
        "text": pa.array([r[5] for r in rows], pa.string()),
        "tool": pa.array([r[6] for r in rows], pa.string()),
        "ts": pa.array([r[7] for r in rows], pa.int64()).cast(pa.timestamp("ms")),
    })


class TestExplode:
    def test_puts_and_markers(self):
        ev = make_events([
            (1, "I", "c0", 0, "user", "hi", None, 100),
            (2, "D", "c0", 1, None, None, None, 200),
        ])
        cells = explode_cells(ev)
        # insert writes role+text (tool null → not written), delete = 1 DR
        assert cells.num_rows == 3
        ops = sorted(cells["cell_op"].to_pylist())
        assert ops == ["DR", "U", "U"]
        dr = cells.filter(pa.compute.equal(cells["cell_op"], "DR"))
        assert dr["col_name"].to_pylist() == [None]

    def test_empty_batch_typed(self):
        cells = explode_cells(make_events([]))
        assert cells.num_rows == 0
        assert "col_name" in cells.column_names


@pytest.mark.usefixtures("ray_session")
class TestAssemble:
    def _assemble(self, ev):
        import ray.data as rd

        out = assemble_cells(cell_changelog(rd.from_arrow(ev)),
                             num_partitions=2)
        return out.to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)

    def test_roundtrip_simple(self):
        ev = make_events([
            (1, "I", "c0", 0, "user", "hello", None, 100),
            (2, "U", "c0", 0, None, "hello v2", "search", 200),
        ])
        df = self._assemble(ev)
        assert len(df) == 1
        # cell-granularity merge: role survives from lsn1, text/tool from lsn2
        assert df.loc[0, "role"] == "user"
        assert df.loc[0, "text"] == "hello v2"
        assert df.loc[0, "tool"] == "search"
        assert df.loc[0, "lsn"] == 2

    def test_delete_kills_row(self):
        import ray.data as rd

        ev = make_events([
            (1, "I", "c0", 0, "user", "hello", None, 100),
            (2, "D", "c0", 0, None, None, None, 200),
        ])
        out = assemble_cells(cell_changelog(rd.from_arrow(ev)),
                             num_partitions=2)
        assert out.count() == 0

    def test_resurrection_keeps_only_newer_cells(self):
        """put text (ts1) → delete row (ts2) → put role (ts3): the row is
        alive with role only; the pre-delete text cell stays dead."""
        ev = make_events([
            (1, "I", "c0", 0, None, "old text", None, 100),
            (2, "D", "c0", 0, None, None, None, 200),
            (3, "U", "c0", 0, "assistant", None, None, 300),
        ])
        df = self._assemble(ev)
        assert len(df) == 1
        assert df.loc[0, "role"] == "assistant"
        assert df.loc[0, "text"] is None or (isinstance(df.loc[0, "text"], float)
                                             and np.isnan(df.loc[0, "text"]))
        assert df.loc[0, "lsn"] == 3

    def test_out_of_order_arrival_is_immaterial(self):
        rows = [
            (1, "I", "c0", 0, None, "old text", None, 100),
            (2, "D", "c0", 0, None, None, None, 200),
            (3, "U", "c0", 0, "assistant", None, None, 300),
        ]
        a = self._assemble(make_events(rows))
        b = self._assemble(make_events(rows[::-1]))
        assert a.equals(b)
