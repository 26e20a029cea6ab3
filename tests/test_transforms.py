"""dx_* transform semantics vs the documented reference rules (FIXTURES.md
F5; core/.../transport/transformer/*.java). Kernel tests are Ray-free;
chain/dead-letter/error-budget tests run on Ray."""

import pyarrow as pa
import pytest

from datax_ray.transforms import (
    Counters,
    DxFilter,
    DxPad,
    DxPython,
    DxReplace,
    DxSubstr,
    ErrorLimit,
    ErrorLimitExceeded,
    TransformChain,
    build_transform,
    register_transform,
)
from datax_ray.transforms.chain import read_dead_letters


def T(**cols):
    return pa.table(cols)


def col(table, name):
    return table[name].to_pylist()


class TestSubstr:
    def test_basic_and_clamp(self):
        t = T(s=["hello world", "hi", None])
        out = DxSubstr("s", 0, 5).apply(t)
        assert col(out, "s") == ["hello", "hi", None]  # clamp + null pass

    def test_start_beyond_len_is_dirty(self):
        t = T(s=["abc", "a", None, "abcd"])
        dm = DxSubstr("s", 3, 2).dirty_mask(t)
        # start=3 > len("a")=1 dirty; len("abc")=3 not dirty (start==len ok);
        # null never dirty
        assert dm.to_pylist() == [False, True, False, False]
        clean = t.filter(pa.compute.invert(dm))
        out = DxSubstr("s", 3, 2).apply(clean)
        assert col(out, "s") == ["", None, "d"]


class TestPad:
    def test_pad_left_right_truncate_null(self):
        t = T(s=["ab", "abcdefgh", None])
        out = DxPad("s", "l", 5, "xy").apply(t)
        assert col(out, "s") == ["xyxab", "abcde", "xyxyx"]  # null → "" → full pad
        out = DxPad("s", "r", 5, "xy").apply(t)
        assert col(out, "s") == ["abxyx", "abcde", "xyxyx"]

    def test_bad_params(self):
        with pytest.raises(ValueError):
            DxPad("s", "m", 5, "x")
        with pytest.raises(ValueError):
            DxPad("s", "l", 5, "")


class TestReplace:
    def test_splice_and_null(self):
        t = T(s=["hello world", "hey", None])
        out = DxReplace("s", 0, 5, "goodbye").apply(t)
        assert col(out, "s") == ["goodbye world", "goodbye", None]

    def test_tail_dropped_when_range_overruns(self):
        t = T(s=["abcdef"])
        out = DxReplace("s", 2, 100, "X").apply(t)
        assert col(out, "s") == ["abX"]

    def test_start_beyond_len_dirty(self):
        t = T(s=["ab", "abcd"])
        assert DxReplace("s", 3, 1, "X").dirty_mask(t).to_pylist() == [True, False]


class TestFilter:
    # convention: drop_mask True ⇒ row REMOVED (dx_filter matches ⇒ drop)

    def test_like_full_match_drops(self):
        t = T(s=["abc", "abcd", None, "xbc"])
        m = DxFilter("s", "like", "ab.*").drop_mask(t)
        assert m.to_pylist() == [True, True, False, False]  # null kept

    def test_not_like_drops_null(self):
        t = T(s=["abc", "xbc", None])
        m = DxFilter("s", "not like", "ab.*").drop_mask(t)
        assert m.to_pylist() == [False, True, True]  # ref: null row dropped

    def test_numeric_compare_null_never_dropped(self):
        t = T(v=pa.array([1.5, 3.0, None]))
        assert DxFilter("v", ">", "2").drop_mask(t).to_pylist() == [False, True, False]
        assert DxFilter("v", "<=", "1.5").drop_mask(t).to_pylist() == [True, False, False]

    def test_int_and_timestamp_compare_as_long(self):
        t = T(v=pa.array([10, 20, None], pa.int64()))
        assert DxFilter("v", ">=", "20").drop_mask(t).to_pylist() == [False, True, False]
        ts = pa.array([1000, 2000, None], pa.int64()).cast(pa.timestamp("ms"))
        t2 = T(ts=ts)
        assert DxFilter("ts", "<", "1500").drop_mask(t2).to_pylist() == [True, False, False]

    def test_equal_null_rules(self):
        t = T(s=["a", "null", None])
        # '= null' drops the null row AND the literal "null" string row
        assert DxFilter("s", "=", "null").drop_mask(t).to_pylist() == [False, True, True]
        # '!= null' keeps null, drops everything not equal to "null"
        assert DxFilter("s", "!=", "null").drop_mask(t).to_pylist() == [True, False, False]
        # '= a' drops "a", keeps null
        assert DxFilter("s", "=", "a").drop_mask(t).to_pylist() == [True, False, False]
        # '!= a' drops non-a and drops null (ref: null filtered for != v)
        assert DxFilter("s", "!=", "a").drop_mask(t).to_pylist() == [False, True, True]

    def test_bool_compares_as_string(self):
        t = T(b=pa.array([True, False, None]))
        assert DxFilter("b", "=", "true").drop_mask(t).to_pylist() == [True, False, False]

    def test_string_lexicographic(self):
        t = T(s=["apple", "pear"])
        assert DxFilter("s", ">", "banana").drop_mask(t).to_pylist() == [False, True]

    def test_bad_op_or_empty_value(self):
        with pytest.raises(ValueError):
            DxFilter("s", "~", "x")
        with pytest.raises(ValueError):
            DxFilter("s", "=", "")


class TestRegistry:
    def test_build_from_spec(self):
        t = T(s=["hello"])
        tr = build_transform(
            {"name": "dx_substr", "parameter": {"column": "s", "start": 0, "length": 2}}
        )
        assert col(tr.apply(t), "s") == ["he"]

    def test_user_transform_name_rule(self):
        with pytest.raises(ValueError):
            register_transform("dx_custom", lambda **kw: DxPython(lambda b: b))
        register_transform("my_upper", lambda column, **_: DxPython(
            lambda b: b.set_column(
                b.schema.get_field_index(column),
                pa.field(column, pa.string()),
                pa.compute.utf8_upper(b[column]),
            )
        ))
        tr = build_transform({"name": "my_upper", "parameter": {"column": "s"}})
        assert col(tr.apply(T(s=["ab"])), "s") == ["AB"]


class TestChainLocal:
    def test_chain_short_circuits_dirty_and_filters(self, tmp_path):
        dl = str(tmp_path / "dead")
        chain = TransformChain(
            [
                DxSubstr("s", 2, 3),          # "a" is dirty here (start>len)
                DxFilter("s", "like", "xx.*"),  # drops rows starting xx
                DxPad("s", "r", 5, "-"),
            ],
            dead_letter_dir=dl,
        )
        t = T(s=["a", "xxyzw", "hello", None])
        out = chain(t)
        # "a" → dead letter; "xxyzw"→"yzw"? no: substr(2,3) of "xxyzw"="yzw",
        # filter ^xx.*$ doesn't match "yzw" → kept; "hello"→"llo"; null passes
        assert col(out, "s") == ["yzw--", "llo--", "-----"]
        dead = read_dead_letters(dl)
        assert dead.num_rows == 1
        assert dead["s"].to_pylist() == ["a"]
        assert dead["_error"].to_pylist() == ["dx_substr"]

    def test_error_limit_precedence(self):
        # record limit wins over percentage (ErrorRecordChecker rule)
        with pytest.raises(ErrorLimitExceeded, match="records"):
            ErrorLimit(record=0, percentage=1.0).check(dirty=1, total=10)
        with pytest.raises(ErrorLimitExceeded, match="ratio"):
            ErrorLimit(record=100, percentage=0.01).check(dirty=5, total=100)
        ErrorLimit(record=5, percentage=0.5).check(dirty=5, total=100)  # ok


@pytest.mark.usefixtures("ray_session")
class TestChainOnRay:
    def test_chain_with_counters_and_budget(self, tmp_path):
        import ray.data as rd

        dl = str(tmp_path / "dead")
        counters = Counters()
        ds = rd.from_arrow(
            T(s=["a", "xxdrop", "keepme", None, "b"])
        )
        chain = TransformChain(
            [DxSubstr("s", 2, 2), DxFilter("s", "like", "dr.*")],
            dead_letter_dir=dl,
            counters=counters,
        )
        out = ds.map_batches(chain, batch_format="pyarrow").to_pandas()
        # "a","b" dirty; "xxdrop"→"dr"? substr(2,2)="dr" → filtered;
        # "keepme"→"ep" kept; null passes both
        assert sorted(x if x is not None else "~" for x in out["s"]) == ["ep", "~"]
        tot = counters.totals()
        assert tot == {"input": 5, "succeeded": 2, "filtered": 1, "dirty": 2}
        dead = read_dead_letters(dl)
        assert dead.num_rows == 2
        with pytest.raises(ErrorLimitExceeded):
            ErrorLimit(record=0).check(tot["dirty"], tot["input"])
