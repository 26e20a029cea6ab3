"""Round-4 additions: Arrow-native tokenize equivalence pin, fast-vs-md5
sampling distribution equivalence, LSH fixture determinism, compaction
retention (time travel surviving compaction)."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF_DIR = "/root/testdata/sf0.001"

TRICKY = [
    "hello world", "  leading", "trailing   ", "a\t\tb", "a\nb\rc",
    "", "   ", None, "one", "a  b   c", "a\xa0b nbsp", "tok",
    "mixed \t \n ws thin", "ünïcode tökens", "x " * 50,
]


def _pandas_flat_token_hashes(texts):
    """The pre-round-4 implementation, kept verbatim as the behavioral pin
    for the Arrow-native path (ops/hashing.py:flat_token_hashes)."""
    s = pd.Series(texts, dtype=object).fillna("")
    token_lists = s.str.split()
    lengths = token_lists.str.len().fillna(0).to_numpy(dtype=np.int64)
    offsets = np.zeros(len(texts) + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    if offsets[-1] == 0:
        return np.zeros(0, dtype=np.uint64), offsets
    flat = np.concatenate([t if t else [] for t in token_lists]).astype(object)
    return pd.util.hash_array(flat, categorize=False), offsets


class TestArrowTokenize:
    def test_flat_token_hashes_matches_pandas_path(self):
        from datax_ray.ops.hashing import flat_token_hashes

        for texts in (TRICKY, [], [None, None], ["", " ", "\t"]):
            got_h, got_o = flat_token_hashes(texts)
            want_h, want_o = _pandas_flat_token_hashes(texts)
            np.testing.assert_array_equal(got_o, want_o)
            np.testing.assert_array_equal(got_h, want_h)
            # and via a pyarrow column (the hot-path input type)
            got_h2, got_o2 = flat_token_hashes(pa.array(texts, pa.string()))
            np.testing.assert_array_equal(got_o2, want_o)
            np.testing.assert_array_equal(got_h2, want_h)

    def test_signatures_byte_identical_on_corpus(self):
        from datax_ray.ops.hashing import (
            minhash_batch,
            shingle_hashes,
            simhash_batch,
        )

        t = pq.read_table(os.path.join(SF_DIR, "documents.parquet"),
                          columns=["text"])
        texts = t["text"].to_pylist()
        # reference signatures from the pinned pandas tokenization
        th, off = _pandas_flat_token_hashes(texts)
        sh, sh_off = shingle_hashes(th, off, 3)
        got = minhash_batch(t["text"], 64, 3, seed=7)
        # recompute minhash from the reference shingles
        rng = np.random.default_rng(7)
        M = np.uint64((1 << 61) - 1)
        a = rng.integers(1, M, 64, dtype=np.uint64)
        b = rng.integers(0, M, 64, dtype=np.uint64)
        want = np.full((len(texts), 64), np.iinfo(np.uint64).max,
                       dtype=np.uint64)
        seg = np.diff(sh_off)
        nz = seg > 0
        starts = sh_off[:-1][nz]
        with np.errstate(over="ignore"):
            for j in range(64):
                vals = (a[j] * sh + b[j]) % M
                want[nz, j] = np.minimum.reduceat(vals, starts)
        np.testing.assert_array_equal(got, want)
        # simhash pin: Arrow column input == list input == pinned tokens
        np.testing.assert_array_equal(simhash_batch(t["text"]),
                                      simhash_batch(texts))


@pytest.mark.usefixtures("ray_session")
class TestFastVsMd5Sampling:
    """The oracled driver queries run mode='md5' (SQL-reproducible); the
    100-TB production path is mode='fast' (vectorized siphash). Pin that
    the fast path draws from the same distribution as the oracle path."""

    def _orders(self, n=20000):
        import ray.data as rd

        rng = np.random.default_rng(12)
        return rd.from_arrow(pa.table({
            "k": pa.array(np.arange(n, dtype=np.int64)),
            "g": pa.array(rng.integers(0, 40, n).astype(np.int64)),
        })).repartition(8)

    def test_hash_sample_fraction_chi2(self):
        from datax_ray.ops.sample import hash_sample

        n, frac = 20000, 0.2
        counts = {}
        for mode in ("fast", "md5"):
            counts[mode] = hash_sample(self._orders(n), key_col="k",
                                       fraction=frac, mode=mode).count()
        # two-proportion z-test: both are Binomial(n, frac); each must sit
        # within 4σ of the mean, and they must agree within 6σ of the
        # difference distribution (loose: deterministic seeds, no flakes)
        sd = (n * frac * (1 - frac)) ** 0.5
        for mode, c in counts.items():
            assert abs(c - n * frac) < 4 * sd, (mode, c)
        assert abs(counts["fast"] - counts["md5"]) < 6 * sd * np.sqrt(2)

    def test_hash_sample_boundaries(self):
        from datax_ray.ops.sample import hash_sample, md5_sample_sql_predicate

        ds = self._orders(1000)
        assert hash_sample(ds, key_col="k", fraction=1.0, mode="md5").count() == 1000
        assert hash_sample(ds, key_col="k", fraction=0.0, mode="md5").count() == 0
        assert md5_sample_sql_predicate("k", 1.0) == "TRUE"
        assert md5_sample_sql_predicate("k", 0.0) == "FALSE"

    def test_stratified_exact_k_per_key_both_modes(self):
        from datax_ray.ops.sample import stratified_sample

        for mode in ("fast", "md5"):
            out = stratified_sample(self._orders(8000), key_col="g",
                                    id_col="k", k=3, mode=mode).to_pandas()
            per_key = out.groupby("g")["k"].agg(["count", "nunique"])
            assert (per_key["count"] == 3).all(), mode  # 40 keys × 200 rows
            assert (per_key["nunique"] == 3).all(), mode
            assert set(per_key.index) == set(range(40)), mode

    def test_stratified_fast_selection_uniform(self):
        """The fast path's per-key winners should be ~uniform over each
        key's members: the mean selected id must land near the population
        mean (binomial-ish bound over 40 keys × 3 picks)."""
        from datax_ray.ops.sample import stratified_sample

        out = stratified_sample(self._orders(8000), key_col="g",
                                id_col="k", k=3, mode="fast").to_pandas()
        m = out["k"].mean()
        # population ids uniform on [0, 8000): mean 4000, sd of the mean of
        # 120 uniform draws = 8000/sqrt(12)/sqrt(120) ≈ 211; 4σ ≈ 845
        assert abs(m - 4000) < 845, m


@pytest.mark.usefixtures("ray_session")
class TestCompactionRetention:
    """keep_epochs=N preserves the last N epochs' deltas through compaction
    (snapshot retention): time travel to epochs above the folded boundary
    keeps working, below it raises — and the current state is byte-equal
    to an uncompacted replay of the same log."""

    def _lake(self, tmp_path, name, **kw):
        from datax_ray.cdc.replay import replay_files
        from datax_ray.sources.generators import (
            ChangelogSpec,
            write_changelog_parquet,
        )

        cl = str(tmp_path / "cl")
        if not os.path.isdir(cl):
            write_changelog_parquet(
                ChangelogSpec(n_events=4000, n_convs=60, max_turns=8,
                              n_blocks=2, seed=23), cl)
        lake = str(tmp_path / name)
        replay_files(cl, lake_dir=lake, max_lsn_exclusive=4000,
                     num_partitions=4, epoch_size=500, **kw)
        return lake

    def test_time_travel_survives_compaction_with_retention(self, tmp_path):
        import glob

        from datax_ray.sinks.lake import read_lake_table

        plain = self._lake(tmp_path, "lake_plain", compact_every=0)
        ret = self._lake(tmp_path, "lake_ret", compact_every=4,
                         keep_epochs=3)
        # compaction actually ran: a base file exists, folded at epoch ≤ 4
        bases = glob.glob(os.path.join(ret, "data", "part=*", "base-*.parquet"))
        assert bases, "retention compaction must have produced base files"
        from datax_ray.sinks.lake import file_epoch

        assert max(file_epoch(b) for b in bases) <= 4  # cutoff = 7 - 3
        # snapshots above the folded boundary still reconstruct exactly
        for e in (5, 6, 7):
            got = read_lake_table(ret, as_of_epoch=e)
            want = read_lake_table(plain, as_of_epoch=e)
            assert got.equals(want), f"as_of_epoch={e} diverged"
        # current state matches too
        assert read_lake_table(ret).equals(read_lake_table(plain))
        # below the boundary the snapshot is gone — must raise, not lie
        with pytest.raises(ValueError, match="compacted"):
            read_lake_table(ret, as_of_epoch=2)

    def test_no_retention_folds_everything(self, tmp_path):
        import glob

        from datax_ray.sinks.lake import file_epoch, read_lake_table

        lake = self._lake(tmp_path, "lake_all", compact_every=4)
        bases = glob.glob(os.path.join(lake, "data", "part=*", "base-*.parquet"))
        assert bases and max(file_epoch(b) for b in bases) >= 4
        with pytest.raises(ValueError, match="compacted"):
            read_lake_table(lake, as_of_epoch=0)


class TestLshFixtureDeterminism:
    def test_fixture_marker_caches(self, tmp_path):
        import time

        from datax_ray.ops.lsh_fixture import ensure_lsh_fixture

        out = ensure_lsh_fixture(SF_DIR)
        sig_path = os.path.join(out, "minhash_sigs.parquet")
        mtime = os.stat(sig_path).st_mtime_ns
        time.sleep(0.01)
        ensure_lsh_fixture(SF_DIR)  # marker hit: no rewrite
        assert os.stat(sig_path).st_mtime_ns == mtime

    def test_planes_match_engine(self):
        from datax_ray.ops.lsh_fixture import (
            NEARDUP_PARAMS,
            ensure_planes_fixture,
            lsh_planes,
        )

        path = ensure_planes_fixture()
        t = pq.read_table(path)
        p = NEARDUP_PARAMS
        planes = lsh_planes(p["dim"], p["n_bits"], p["seed"])  # (dim, bits)
        got = np.stack(t["plane"].to_numpy(zero_copy_only=False))
        np.testing.assert_array_equal(got, planes.T)
        assert t["bit"].to_pylist() == list(range(p["n_bits"]))


class TestAsofJoin:
    """Backward as-of join (shuffle + broadcast paths) pinned against
    pandas merge_asof on a randomized keyed time series."""

    def _frames(self, seed=7, n_left=400, n_right=300, n_keys=12):
        rng = np.random.default_rng(seed)
        left = pd.DataFrame({
            "k": rng.integers(0, n_keys, n_left),
            "t": rng.integers(0, 10_000, n_left).astype(np.int64),
            "lv": np.arange(n_left, dtype=np.int64),
        })
        right = pd.DataFrame({
            "k": rng.integers(0, n_keys + 2, n_right),  # some keys miss
            "t": rng.integers(0, 10_000, n_right).astype(np.int64),
            "rv": np.arange(n_right, dtype=np.int64),
        })
        # merge_asof needs unique (k, t) on the right to be a deterministic
        # oracle (ties broken by last row); drop dup timestamps instead
        right = right.drop_duplicates(["k", "t"], keep="last")
        return left, right

    def _oracle(self, left, right, tolerance=None):
        ora = pd.merge_asof(
            left.sort_values("t", kind="stable"),
            right.sort_values("t", kind="stable").rename(
                columns={"t": "t_r", "rv": "rv_r"}),
            left_on="t", right_on="t_r", by="k", direction="backward",
            tolerance=tolerance, allow_exact_matches=True)
        return ora.sort_values("lv").reset_index(drop=True)

    @pytest.mark.parametrize("how", ["left", "inner"])
    def test_shuffle_path_matches_merge_asof(self, ray_session, how):
        import ray.data as rd

        from datax_ray.ops.joins import asof_join

        left, right = self._frames()
        got = asof_join(
            rd.from_pandas(left).repartition(5),
            rd.from_pandas(right).repartition(4),
            by="k", on="t", right_cols=["rv"], how=how, num_partitions=8,
        ).to_pandas().sort_values("lv").reset_index(drop=True)
        ora = self._oracle(left, right)
        if how == "inner":
            ora = ora[ora["t_r"].notna()].reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got[["k", "t", "lv", "t_r", "rv_r"]],
            ora[["k", "t", "lv", "t_r", "rv_r"]].astype(
                {"t_r": "float64", "rv_r": "float64"}),
            check_dtype=False)

    def test_broadcast_path_and_tolerance(self, ray_session):
        import ray.data as rd

        from datax_ray.ops.joins import asof_join, asof_join_broadcast

        left, right = self._frames(seed=11)
        for tol in (None, 500):
            got = asof_join_broadcast(
                rd.from_pandas(left).repartition(5), right,
                by="k", on="t", right_cols=["rv"], tolerance=tol,
            ).to_pandas().sort_values("lv").reset_index(drop=True)
            ora = self._oracle(left, right, tolerance=tol)
            pd.testing.assert_frame_equal(
                got[["k", "t", "lv", "t_r", "rv_r"]],
                ora[["k", "t", "lv", "t_r", "rv_r"]].astype(
                    {"t_r": "float64", "rv_r": "float64"}),
                check_dtype=False)
            # shuffle path agrees with broadcast path under tolerance too
            got2 = asof_join(
                rd.from_pandas(left).repartition(5),
                rd.from_pandas(right).repartition(4),
                by="k", on="t", right_cols=["rv"], tolerance=tol,
                num_partitions=8,
            ).to_pandas().sort_values("lv").reset_index(drop=True)
            pd.testing.assert_frame_equal(
                got[["k", "t", "lv", "t_r", "rv_r"]],
                got2[["k", "t", "lv", "t_r", "rv_r"]], check_dtype=False)

    def test_right_ties_take_latest_sorted_row(self, ray_session):
        import ray.data as rd

        from datax_ray.ops.joins import asof_join

        left = pd.DataFrame({"k": [1], "t": [10], "lv": [0]})
        right = pd.DataFrame({"k": [1, 1], "t": [10, 10], "rv": [5, 9]})
        got = asof_join(rd.from_pandas(left), rd.from_pandas(right),
                        by="k", on="t", right_cols=["rv"],
                        num_partitions=2).to_pandas()
        assert got["rv_r"].tolist() == [9]  # max rv at equal (k, t)


class TestIntervalJoin:
    """Range join (lo <= ts < hi) against a brute-force oracle; bucketed
    path must be exact and duplicate-free for intervals spanning buckets."""

    def _data(self, seed=3, n=500, n_iv=25):
        rng = np.random.default_rng(seed)
        rows = pd.DataFrame({
            "ts": rng.integers(0, 100_000, n).astype(np.int64),
            "rid": np.arange(n, dtype=np.int64),
        })
        lo = rng.integers(0, 95_000, n_iv).astype(np.int64)
        hi = lo + rng.integers(1, 40_000, n_iv)  # long spans cross buckets
        iv = pa.table({"iv_id": pa.array(np.arange(n_iv)),
                       "lo": pa.array(lo), "hi": pa.array(hi)})
        pairs = [(int(r), int(i)) for r in range(n) for i in range(n_iv)
                 if lo[i] <= rows["ts"][r] < hi[i]]
        return rows, iv, sorted(pairs)

    def test_broadcast_matches_bruteforce(self, ray_session):
        import ray.data as rd

        from datax_ray.ops.joins import interval_join_broadcast

        rows, iv, want = self._data()
        got = interval_join_broadcast(
            rd.from_pandas(rows).repartition(4), iv, ts_col="ts",
        ).to_pandas()
        assert sorted(zip(got["rid"], got["iv_id"])) == want

    @pytest.mark.parametrize("bucket", [1_000, 7_777, 50_000])
    def test_bucketed_matches_bruteforce(self, ray_session, bucket):
        import ray.data as rd

        from datax_ray.ops.joins import interval_join_bucketed

        rows, iv, want = self._data(seed=5)
        got = interval_join_bucketed(
            rd.from_pandas(rows).repartition(4), iv, ts_col="ts",
            bucket=bucket, num_partitions=8,
        ).to_pandas()
        assert sorted(zip(got["rid"], got["iv_id"])) == want

    def test_empty_intersection(self, ray_session):
        import ray.data as rd

        from datax_ray.ops.joins import interval_join_broadcast

        rows = pd.DataFrame({"ts": np.array([1, 2], dtype=np.int64),
                             "rid": np.array([0, 1], dtype=np.int64)})
        iv = pa.table({"iv_id": pa.array([0]),
                       "lo": pa.array([100], type=pa.int64()),
                       "hi": pa.array([200], type=pa.int64())})
        got = interval_join_broadcast(rd.from_pandas(rows), iv, ts_col="ts")
        # schema survives on the empty result (to_pandas drops columns on
        # an all-empty dataset — a Ray quirk, so assert at the Dataset level)
        assert got.schema().names == ["ts", "rid", "iv_id", "lo", "hi"]
        assert got.count() == 0


class TestNgramJaccardPairs:
    """Distributed inverted-index exact n-gram Jaccard vs the scalar
    brute-force oracle, plus the max_df underestimate contract."""

    def _texts(self, seed=0, n=120):
        rng = np.random.default_rng(seed)
        vocab = np.array(["alpha", "beta", "gamma", "delta", "eps",
                          "zeta", "eta", "theta"])
        texts = [" ".join(rng.choice(vocab, rng.integers(0, 15)))
                 for _ in range(n)]
        texts += ["alpha beta gamma delta", "alpha beta gamma delta",
                  "", "  ", "one two"]
        return texts

    def _brute(self, texts, threshold):
        from datax_ray.ops.dedup import ngram_jaccard

        want = set()
        for i in range(len(texts)):
            for j in range(i + 1, len(texts)):
                if not texts[i].split() or not texts[j].split():
                    continue  # empty docs never share a posting
                jc = ngram_jaccard(texts[i], texts[j], 3)
                if jc > 0 and jc >= threshold:
                    want.add((i, j, round(jc, 6)))
        return want

    def test_matches_bruteforce(self, ray_session):
        import ray.data as rd

        from datax_ray.ops.dedup import ngram_jaccard_pairs

        texts = self._texts()
        t = pa.table({"doc_id": pa.array(np.arange(len(texts)),
                                         type=pa.int64()),
                      "text": pa.array(texts)})
        got = ngram_jaccard_pairs(
            rd.from_arrow(t).repartition(4), threshold=0.2,
            num_partitions=8).to_pandas()
        assert set(zip(got.id_a, got.id_b, got.jaccard)) == \
            self._brute(texts, 0.2)

    def test_max_df_only_underestimates(self, ray_session):
        import ray.data as rd

        from datax_ray.ops.dedup import ngram_jaccard_pairs

        texts = self._texts(seed=2)
        t = pa.table({"doc_id": pa.array(np.arange(len(texts)),
                                         type=pa.int64()),
                      "text": pa.array(texts)})
        ds = rd.from_arrow(t).repartition(4)
        exact = {(a, b): j for a, b, j in self._brute(texts, 0.0)}
        capped = ngram_jaccard_pairs(ds, threshold=0.05, max_df=5,
                                     num_partitions=8).to_pandas()
        for a, b, j in zip(capped.id_a, capped.id_b, capped.jaccard):
            assert (a, b) in exact          # no false positives
            assert j <= exact[(a, b)] + 1e-9  # never over-estimates


class TestHashJoin:
    """Large-large tagged-union hash join vs pandas merge across all join
    types, including payload-name collisions and keys absent on one side."""

    def _frames(self, seed=9):
        rng = np.random.default_rng(seed)
        L = pd.DataFrame({"k": rng.integers(0, 40, 300).astype(np.int64),
                          "x": np.arange(300, dtype=np.int64),
                          "v": rng.integers(0, 100, 300).astype(np.int64)})
        R = pd.DataFrame({"k": rng.integers(10, 55, 200).astype(np.int64),
                          "y": np.arange(200, dtype=np.int64),
                          "v": rng.integers(0, 100, 200).astype(np.int64)})
        return L, R

    @pytest.mark.parametrize("how,pd_how", [
        ("inner", "inner"), ("left", "left"),
        ("right", "right"), ("outer", "outer")])
    def test_matches_pandas_merge(self, ray_session, how, pd_how):
        import ray.data as rd

        from datax_ray.ops.joins import hash_join

        L, R = self._frames()
        got = hash_join(rd.from_pandas(L).repartition(4),
                        rd.from_pandas(R).repartition(3),
                        on="k", how=how, num_partitions=8).to_pandas()
        want = L.merge(R, on="k", how=pd_how, suffixes=("", "_r"))
        want = want.rename(columns={"v_r": "v_r", "y": "y"})
        cols = sorted(got.columns)
        assert sorted(want.columns) == cols
        a = got[cols].sort_values(cols, na_position="last",
                                  kind="stable").reset_index(drop=True)
        b = want[cols].sort_values(cols, na_position="last",
                                   kind="stable").reset_index(drop=True)
        assert len(a) == len(b)
        for c in cols:
            x, y = a[c].astype("float64"), b[c].astype("float64")
            assert ((x == y) | (x.isna() & y.isna())).all(), (how, c)

    @pytest.mark.parametrize("how", ["semi", "anti"])
    def test_semi_anti(self, ray_session, how):
        import ray.data as rd

        from datax_ray.ops.joins import hash_join

        L, R = self._frames(seed=21)
        got = hash_join(rd.from_pandas(L).repartition(4),
                        rd.from_pandas(R).repartition(3),
                        on="k", how=how, num_partitions=8).to_pandas()
        in_r = L["k"].isin(set(R["k"]))
        want = L[in_r if how == "semi" else ~in_r]
        assert sorted(zip(got.k, got.x, got.v)) == \
            sorted(zip(want.k, want.x, want.v))

    def test_missing_key_raises(self, ray_session):
        import ray.data as rd

        from datax_ray.ops.joins import hash_join

        L, R = self._frames()
        with pytest.raises(ValueError, match="join key"):
            hash_join(rd.from_pandas(L),
                      rd.from_pandas(R.rename(columns={"k": "kk"})), on="k")


@pytest.mark.usefixtures("ray_session")
class TestTableChanges:
    """Change-data-feed out of the lake: the I/U/D set between two
    snapshots must APPLY cleanly — old state + changes == new state —
    and from_epoch=None must equal the full state as inserts."""

    def _lake(self, tmp_path):
        from datax_ray.cdc.replay import replay_files
        from datax_ray.sources.generators import (
            ChangelogSpec,
            write_changelog_parquet,
        )

        cl = str(tmp_path / "cl")
        write_changelog_parquet(
            ChangelogSpec(n_events=6000, n_convs=80, max_turns=8,
                          n_blocks=2, p_delete=0.15, seed=31), cl)
        lake = str(tmp_path / "lake")
        replay_files(cl, lake_dir=lake, max_lsn_exclusive=6000,
                     num_partitions=4, epoch_size=1500, compact_every=0)
        return lake

    def test_changes_apply_to_old_state(self, tmp_path):
        from datax_ray.sinks.lake import read_lake_table, table_changes

        lake = self._lake(tmp_path)
        old = read_lake_table(lake, as_of_epoch=1).to_pandas()
        new = read_lake_table(lake).to_pandas()
        ch = table_changes(lake, from_epoch=1).to_pandas()
        assert set(ch.change_op) <= {"I", "U", "D"}
        # apply: drop D/U keys from old, add I/U after-images
        key = ["conv_id", "turn_idx"]
        touched = set(map(tuple, ch[key].values))
        kept = old[~old[key].apply(tuple, axis=1).isin(touched)]
        upserts = ch[ch.change_op.isin(["I", "U"])][new.columns.tolist()]
        applied = (
            pd.concat([kept, upserts], ignore_index=True)
            .sort_values(key, kind="stable").reset_index(drop=True)
        )
        new = new.sort_values(key, kind="stable").reset_index(drop=True)
        pd.testing.assert_frame_equal(applied, new, check_dtype=False)
        # I keys must be absent from old, D/U keys present
        old_keys = set(map(tuple, old[key].values))
        for _, r in ch.iterrows():
            k = (r.conv_id, r.turn_idx)
            assert (k not in old_keys) if r.change_op == "I" \
                else (k in old_keys)

    def test_from_none_is_full_insert_set(self, tmp_path):
        from datax_ray.sinks.lake import read_lake_table, table_changes

        lake = self._lake(tmp_path)
        ch = table_changes(lake, from_epoch=None).to_pandas()
        assert (ch.change_op == "I").all()
        state = read_lake_table(lake).to_pandas()
        assert len(ch) == len(state)

    def test_same_epoch_diff_is_empty(self, tmp_path):
        from datax_ray.sinks.lake import table_changes

        lake = self._lake(tmp_path)
        ch = table_changes(lake, from_epoch=3, to_epoch=3)
        assert ch.count() == 0


class TestChunkDocuments:
    """Token-window chunking: coverage/overlap invariants + a scalar
    reference implementation over tricky whitespace."""

    def _ref(self, texts, chunk, overlap):
        stride = chunk - overlap
        rows = []
        for i, s in enumerate(texts):
            toks = (s or "").split()
            n = len(toks)
            if n == 0:
                continue
            nc = 1 if n <= chunk else -((n - chunk) // -stride) + 1
            for c in range(nc):
                w = toks[c * stride: min(c * stride + chunk, n)]
                rows.append((i, c, len(w), " ".join(w)))
        return rows

    def test_matches_reference(self):
        from datax_ray.ops.text import chunk_documents

        texts = TRICKY + ["w" + " w" * 299]  # 300 tokens → many windows
        t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                      "text": pa.array(texts, pa.string())})
        for chunk, overlap in [(4, 1), (16, 8), (128, 16)]:
            out = chunk_documents(t, chunk_tokens=chunk, overlap=overlap)
            got = list(zip(*(out[c].to_pylist() for c in out.column_names)))
            assert got == self._ref(texts, chunk, overlap), (chunk, overlap)

    def test_windows_cover_every_token(self):
        from datax_ray.ops.text import chunk_documents

        toks = [f"t{i}" for i in range(257)]
        t = pa.table({"doc_id": pa.array([0], pa.int64()),
                      "text": pa.array([" ".join(toks)])})
        out = chunk_documents(t, chunk_tokens=64, overlap=16).to_pandas()
        covered = set()
        for _, r in out.iterrows():
            covered.update(r.chunk_text.split())
        assert covered == set(toks)
        assert (out.n_tokens <= 64).all()
        # consecutive windows overlap by exactly `overlap` except the tail
        assert out.chunk_idx.tolist() == list(range(len(out)))

    def test_overlap_ge_chunk_raises(self):
        from datax_ray.ops.text import chunk_documents

        t = pa.table({"doc_id": pa.array([0], pa.int64()),
                      "text": pa.array(["a b"])})
        with pytest.raises(ValueError):
            chunk_documents(t, chunk_tokens=8, overlap=8)


@pytest.mark.usefixtures("ray_session")
class TestDistributedScan:
    """Two-phase prefix sum vs numpy cumsum on shuffled keys, plus the
    packing invariants built on it."""

    def _ds(self, n=5000, seed=5, parts=6):
        import ray.data as rd

        rng = np.random.default_rng(seed)
        self.keys = rng.permutation(n).astype(np.int64)
        self.vals = rng.integers(1, 200, n).astype(np.int64)
        t = pa.table({"k": pa.array(self.keys), "v": pa.array(self.vals)})
        return rd.from_arrow(t).repartition(parts)

    @pytest.mark.parametrize("exclusive", [True, False])
    def test_prefix_sum_matches_cumsum(self, exclusive):
        from datax_ray.ops.scan import prefix_sum

        out = prefix_sum(self._ds(), key_col="k", value_col="v",
                         bucket_size=512, exclusive=exclusive
                         ).to_pandas().sort_values("k")
        v = self.vals[np.argsort(self.keys)]
        want = np.cumsum(v) if not exclusive else np.cumsum(v) - v
        np.testing.assert_array_equal(out.running_total.values, want)

    def test_prefix_sum_keys_beyond_int32_buckets(self):
        """Keys whose bucket id exceeds int32 must not wrap (regression:
        an int32 _bucket cast silently missed the int64 offset map)."""
        import ray.data as rd

        from datax_ray.ops.scan import prefix_sum

        base = np.int64(1) << 41  # bucket id ~2^31 at bucket_size=1024
        # spans three buckets so cross-bucket offsets are exercised too
        keys = base + np.array([1024, 0, 2048, 1023, 2047, 5000],
                               dtype=np.int64)
        vals = np.array([10, 20, 30, 40, 50, 60], dtype=np.int64)
        ds = rd.from_arrow(pa.table({"k": pa.array(keys),
                                     "v": pa.array(vals)})).repartition(3)
        out = (prefix_sum(ds, key_col="k", value_col="v", bucket_size=1024,
                          exclusive=False)
               .to_pandas().sort_values("k"))
        order = np.argsort(keys)
        np.testing.assert_array_equal(out.running_total.values,
                                      np.cumsum(vals[order]))

    def test_bucket_size_invariance(self):
        from datax_ray.ops.scan import prefix_sum

        a = prefix_sum(self._ds(), key_col="k", value_col="v",
                       bucket_size=64).to_pandas().sort_values("k")
        b = prefix_sum(self._ds(), key_col="k", value_col="v",
                       bucket_size=4096).to_pandas().sort_values("k")
        np.testing.assert_array_equal(a.running_total.values,
                                      b.running_total.values)

    def test_pack_bins_invariants(self):
        from datax_ray.ops.scan import assign_pack_bins

        budget = 1000
        out = assign_pack_bins(self._ds(), key_col="k", value_col="v",
                               budget=budget, bucket_size=512
                               ).to_pandas().sort_values("k")
        v = self.vals[np.argsort(self.keys)]
        off = np.cumsum(v) - v
        np.testing.assert_array_equal(out.bin_id.values, off // budget)
        np.testing.assert_array_equal(out.bin_offset.values, off % budget)
        # bins are monotone in key order and start where the previous ends
        assert (np.diff(out.bin_id.values) >= 0).all()
        assert (out.bin_offset.values < budget).all()

    @pytest.mark.parametrize("exclusive", [True, False])
    def test_prefix_max_matches_cummax(self, exclusive):
        from datax_ray.ops.scan import _NEG_INF, prefix_max

        rng = np.random.default_rng(11)
        vals = rng.integers(-10_000, 10_000, 5000).astype(np.int64)
        self._ds()  # populate self.keys with the shuffled permutation
        import ray.data as rd
        t = pa.table({"k": pa.array(self.keys), "v": pa.array(vals)})
        ds = rd.from_arrow(t).repartition(6)
        out = prefix_max(ds, key_col="k", value_col="v", bucket_size=512,
                         exclusive=exclusive).to_pandas().sort_values("k")
        v = vals[np.argsort(self.keys)]
        cm = np.maximum.accumulate(v)
        if exclusive:
            want = np.empty_like(cm)
            want[0] = _NEG_INF
            want[1:] = cm[:-1]
        else:
            want = cm
        np.testing.assert_array_equal(out.running_max.values, want)


@pytest.mark.usefixtures("ray_session")
class TestLateEventRouting:
    """route_late_events vs a sequential watermark simulation: replay
    arrivals one by one, tracking max event time seen so far; an event is
    late iff it trails that watermark by more than the allowed lateness."""

    def _frame(self, n=4000, seed=3):
        rng = np.random.default_rng(seed)
        lsn = np.arange(n, dtype=np.int64)
        # event times drift forward but jitter back up to ~30 min
        base = np.cumsum(rng.integers(0, 120_000, n))  # ms steps
        ev = base - rng.integers(0, 1_800_000, n)
        return lsn, ev.astype(np.int64)

    def _simulate(self, ev_ms, allowed_ms):
        wm = None
        late = np.zeros(len(ev_ms), dtype=bool)
        for i, e in enumerate(ev_ms):
            late[i] = wm is not None and e < wm - allowed_ms
            wm = e if wm is None else max(wm, e)
        return late

    def test_matches_sequential_simulation(self):
        import ray.data as rd

        from datax_ray.ops.scan import route_late_events

        lsn, ev = self._frame()
        t = pa.table({
            "lsn": pa.array(lsn),
            "ts": pa.array(ev * 1000).cast(pa.timestamp("us")),
        })
        allowed = 600_000
        out = (route_late_events(rd.from_arrow(t).repartition(7),
                                 ts_col="ts", order_col="lsn",
                                 allowed_lateness_ms=allowed,
                                 bucket_size=256)
               .to_pandas().sort_values("lsn"))
        want = self._simulate(ev, allowed)
        assert want.any() and not want.all()  # fixture exercises both sides
        np.testing.assert_array_equal(out.is_late.values, want)

    def test_first_arrival_never_late(self):
        import ray.data as rd

        from datax_ray.ops.scan import route_late_events

        t = pa.table({
            "lsn": pa.array([0, 1, 2], pa.int64()),
            "ts": pa.array([10**12, 10**12 - 10**9, 10**12],
                           pa.int64()).cast(pa.timestamp("us")),
        })
        out = (route_late_events(rd.from_arrow(t), ts_col="ts",
                                 order_col="lsn", allowed_lateness_ms=1000)
               .to_pandas().sort_values("lsn"))
        assert not out.is_late.values[0]
        assert out.is_late.values[1]
        assert not out.is_late.values[2]


@pytest.mark.usefixtures("ray_session")
class TestGroupedAgg:
    """Exact grouped quantiles vs numpy percentile (linear interpolation)
    and conversation assembly vs a pandas reference."""

    def test_group_quantiles_matches_numpy(self):
        import ray.data as rd

        from datax_ray.ops.agg import group_quantiles

        rng = np.random.default_rng(8)
        k = rng.integers(0, 12, 3000).astype(np.int64)
        v = rng.random(3000) * 1000
        null = rng.random(3000) < 0.05  # nulls excluded (SQL semantics)
        t = pa.table({"k": pa.array(k), "v": pa.array(v, mask=null)})
        v[null] = np.nan
        out = group_quantiles(
            rd.from_arrow(t).repartition(5), key_col="k", value_col="v",
            quantiles=(0.1, 0.5, 0.9), num_partitions=4
        ).to_pandas().sort_values(["k", "q"]).reset_index(drop=True)
        for key in range(12):
            vals = v[(k == key) & ~np.isnan(v)]
            for q in (0.1, 0.5, 0.9):
                want = round(float(np.percentile(vals, q * 100)), 6)
                got = out[(out.k == key) & (out.q == q)].value.iloc[0]
                assert got == pytest.approx(want, abs=1e-6), (key, q)

    def test_singleton_groups(self):
        import ray.data as rd

        from datax_ray.ops.agg import group_quantiles

        t = pa.table({"k": pa.array([1, 2], pa.int64()),
                      "v": pa.array([10.0, 20.0])})
        out = group_quantiles(rd.from_arrow(t), key_col="k", value_col="v",
                              quantiles=(0.0, 0.5, 1.0)).to_pandas()
        assert (out[out.k == 1].value == 10.0).all()
        assert (out[out.k == 2].value == 20.0).all()

    def test_assemble_conversations(self):
        import ray.data as rd

        from datax_ray.ops.agg import assemble_conversations

        rng = np.random.default_rng(3)
        rows = []
        for c in range(20):
            for tix in rng.permutation(rng.integers(1, 9)):
                rows.append((f"conv_{c}", int(tix),
                             None if rng.random() < 0.1 else
                             f"text {c} {tix}"))
        rng.shuffle(rows)
        t = pa.table({"conv_id": pa.array([r[0] for r in rows]),
                      "turn_idx": pa.array([r[1] for r in rows],
                                           pa.int32()),
                      "text": pa.array([r[2] for r in rows], pa.string())})
        out = assemble_conversations(
            rd.from_arrow(t).repartition(4), num_partitions=4
        ).to_pandas().set_index("conv_id")
        df = t.to_pandas()
        for conv, grp in df.groupby("conv_id"):
            grp = grp.sort_values("turn_idx")
            want = "\n".join(grp.text.fillna(""))
            assert out.loc[conv, "full_text"] == want
            assert out.loc[conv, "n_turns"] == len(grp)


@pytest.mark.usefixtures("ray_session")
class TestIncrementalView:
    """IVM: the incrementally-refreshed aggregate view must equal a full
    rebuild AND the groupby over the current lake state; a refresh must
    only recompute changed conversations; fully-deleted conversations
    must drop out of the view."""

    def _lake(self, tmp_path):
        from datax_ray.cdc.replay import replay_files
        from datax_ray.sources.generators import (
            ChangelogSpec,
            write_changelog_parquet,
        )

        cl = str(tmp_path / "cl")
        write_changelog_parquet(
            ChangelogSpec(n_events=8000, n_convs=60, max_turns=8,
                          n_blocks=2, p_delete=0.2, seed=77), cl)
        lake = str(tmp_path / "lake")
        replay_files(cl, lake_dir=lake, max_lsn_exclusive=8000,
                     num_partitions=4, epoch_size=2000, compact_every=0)
        return lake

    def _expected(self, state_df):
        g = state_df.groupby("conv_id")
        return pd.DataFrame({
            "n_turns": g.size(),
            "n_user": g.role.apply(lambda r: int((r == "user").sum())),
            "text_chars": g.text.apply(
                lambda t: int(t.fillna("").str.len().sum())),
            "last_ts": g.ts.max(),
        }).reset_index().sort_values("conv_id").reset_index(drop=True)

    def test_incremental_equals_full_and_groundtruth(self, tmp_path):
        from datax_ray.cdc.ivm import read_view, refresh_view
        from datax_ray.sinks.lake import read_lake_table

        lake = self._lake(tmp_path)
        inc_dir, full_dir = str(tmp_path / "v_inc"), str(tmp_path / "v_full")
        # incremental: build at epoch 1, then advance to current
        st = refresh_view(lake, inc_dir, to_epoch=1)
        assert st["as_of_epoch"] == 1
        st = refresh_view(lake, inc_dir)
        assert st["as_of_epoch"] == 3
        # full rebuild straight to current
        refresh_view(lake, full_dir)
        cols = ["conv_id", "n_turns", "n_user", "text_chars", "last_ts"]
        inc = read_view(inc_dir).to_pandas().sort_values(
            "conv_id").reset_index(drop=True)[cols]
        full = read_view(full_dir).to_pandas().sort_values(
            "conv_id").reset_index(drop=True)[cols]
        pd.testing.assert_frame_equal(inc, full)
        want = self._expected(read_lake_table(lake).to_pandas())[cols]
        pd.testing.assert_frame_equal(inc, want, check_dtype=False)

    def test_refresh_idempotent_and_prunes(self, tmp_path):
        from datax_ray.cdc.ivm import read_view, refresh_view

        lake = self._lake(tmp_path)
        vd = str(tmp_path / "v")
        refresh_view(lake, vd, to_epoch=2)
        st1 = refresh_view(lake, vd)
        before = read_view(vd).to_pandas()
        st2 = refresh_view(lake, vd)  # no-op: already at current epoch
        assert st1["as_of_epoch"] == st2["as_of_epoch"]
        pd.testing.assert_frame_equal(before, read_view(vd).to_pandas())
        # superseded view-{epoch} files were pruned post-commit
        import glob
        files = glob.glob(os.path.join(vd, "part=*", "view-*.parquet"))
        assert set(files) == set(st1["files"].values())

    def test_deleted_conversation_leaves_view(self, tmp_path):
        """Manually delete every turn of one conversation in a tail epoch:
        the incremental refresh must drop its row."""
        from datax_ray.cdc.ivm import read_view, refresh_view
        from datax_ray.cdc.replay import replay_files
        from datax_ray.sinks.lake import read_lake_table

        lake = self._lake(tmp_path)
        vd = str(tmp_path / "v")
        refresh_view(lake, vd)
        view0 = read_view(vd).to_pandas()
        victim = sorted(view0.conv_id)[0]
        state = read_lake_table(lake).to_pandas()
        turns = state[state.conv_id == victim]
        # append a delete-only epoch for the victim's turns
        tail = pa.table({
            "lsn": pa.array(range(8000, 8000 + len(turns)), pa.int64()),
            "op": pa.array(["D"] * len(turns)),
            "conv_id": pa.array([victim] * len(turns)),
            "turn_idx": pa.array(turns.turn_idx.values, pa.int32()),
            "role": pa.array([None] * len(turns), pa.string()),
            "text": pa.array([None] * len(turns), pa.string()),
            "tool": pa.array([None] * len(turns), pa.string()),
            "ts": pa.array(
                [pd.to_datetime(turns.ts.max()) + pd.Timedelta(hours=1)]
                * len(turns)
            ).cast(pa.timestamp("ms")),
        })
        cl2 = str(tmp_path / "cl2")
        os.makedirs(cl2)
        pq.write_table(tail, os.path.join(cl2, "tail.parquet"))
        replay_files(cl2, lake_dir=lake,
                     max_lsn_exclusive=8000 + len(turns),
                     num_partitions=4, epoch_size=len(turns),
                     compact_every=0)
        st = refresh_view(lake, vd)
        view1 = read_view(vd).to_pandas()
        assert victim in set(view0.conv_id)
        assert victim not in set(view1.conv_id)
        assert len(view1) == len(view0) - 1
        assert st["as_of_epoch"] == 4


@pytest.mark.usefixtures("ray_session")
class TestTailMode:
    """Continuous WAL-tail: chunks appearing over time are applied
    incrementally (several replays), the final lake equals one batch
    replay of the whole log (exactly-once across polls), and an
    interrupted tail resumes from the manifest high-water mark."""

    def _chunks(self, tmp_path, n_events=6000, n_chunks=3):
        from datax_ray.sources.generators import (
            ChangelogSpec,
            write_changelog_parquet,
        )

        full = str(tmp_path / "full")
        write_changelog_parquet(
            ChangelogSpec(n_events=n_events, n_convs=50, max_turns=8,
                          n_blocks=1, p_delete=0.1, seed=5), full)
        t = pa.concat_tables(
            [pq.read_table(f) for f in sorted(
                __import__("glob").glob(os.path.join(full, "*.parquet")))]
        ).sort_by([("lsn", "ascending")])
        per = n_events // n_chunks
        chunks = [t.slice(i * per, per if i < n_chunks - 1 else n_events)
                  for i in range(n_chunks)]
        return full, chunks

    def test_tail_applies_incrementally_and_matches_batch(self, tmp_path):
        import threading

        from datax_ray.cdc.replay import replay_files, tail_files
        from datax_ray.sinks.lake import read_lake_table

        full, chunks = self._chunks(tmp_path)
        live = str(tmp_path / "live")
        os.makedirs(live)

        def feed():
            for i, c in enumerate(chunks):
                tmp = os.path.join(live, f".chunk-{i}.tmp")
                pq.write_table(c, tmp)
                os.replace(tmp, os.path.join(live, f"chunk-{i}.parquet"))
                import time
                time.sleep(0.6)

        w = threading.Thread(target=feed)
        w.start()
        lake = str(tmp_path / "lake_tail")
        res = tail_files(live, lake_dir=lake, num_partitions=4,
                         epoch_size=1000, poll_interval=0.2, idle_polls=8)
        w.join()
        assert res.replays >= 2, "tail should have applied multiple ranges"
        assert res.events_applied == 6000
        assert res.last_lsn_exclusive == 6000
        # byte-equal to a one-shot batch replay of the same log
        lake_b = str(tmp_path / "lake_batch")
        replay_files(full, lake_dir=lake_b, max_lsn_exclusive=6000,
                     num_partitions=4, epoch_size=1000)
        a = read_lake_table(lake).to_pandas().sort_values(
            ["conv_id", "turn_idx"]).reset_index(drop=True)
        b = read_lake_table(lake_b).to_pandas().sort_values(
            ["conv_id", "turn_idx"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)

    def test_tail_resumes_from_manifest(self, tmp_path):
        from datax_ray.cdc.replay import tail_files
        from datax_ray.sinks.lake import read_lake_table

        full, chunks = self._chunks(tmp_path)
        live = str(tmp_path / "live")
        os.makedirs(live)
        pq.write_table(chunks[0], os.path.join(live, "chunk-0.parquet"))
        lake = str(tmp_path / "lake")
        r1 = tail_files(live, lake_dir=lake, num_partitions=4,
                        epoch_size=1000, poll_interval=0.05, idle_polls=2)
        assert r1.last_lsn_exclusive == 2000
        # "restart": new tail instance sees the manifest high-water mark,
        # applies only the two new chunks
        for i in (1, 2):
            pq.write_table(chunks[i], os.path.join(live, f"chunk-{i}.parquet"))
        r2 = tail_files(live, lake_dir=lake, num_partitions=4,
                        epoch_size=1000, poll_interval=0.05, idle_polls=2)
        assert r2.events_applied == 4000
        assert r2.last_lsn_exclusive == 6000
        assert len(read_lake_table(lake).to_pandas()) > 0

    def test_tail_idle_exit_without_data(self, tmp_path):
        from datax_ray.cdc.replay import tail_files

        live = str(tmp_path / "empty")
        os.makedirs(live)
        res = tail_files(live, lake_dir=str(tmp_path / "lake"),
                         poll_interval=0.01, idle_polls=3)
        assert res.replays == 0 and res.polls == 3

    def test_resumed_tail_counts_only_its_own_dead_letters(self, tmp_path):
        """Dirty attribution across tail restarts: a resumed tail's
        dead_lettered must cover the ranges IT executed, not
        [0, last_lsn) — epochs committed by the earlier run are excluded
        (regression on the TailResult.executed_ranges contract)."""
        from datax_ray.cli import run_job
        from datax_ray.sources.generators import (
            ChangelogSpec,
            generate_changelog_block,
        )

        spec = ChangelogSpec(n_events=2000, n_convs=40, max_turns=8,
                             n_blocks=1, seed=37)
        t = generate_changelog_block(spec, 0).sort_by([("lsn", "ascending")])
        op = t["op"].to_pylist()
        for i in range(0, 50, 10):      # 5 bad events in [0, 1000)
            op[i] = "X"
        for i in range(1000, 1070, 10):  # 7 bad events in [1000, 2000)
            op[i] = "X"
        t = t.set_column(t.schema.get_field_index("op"), "op",
                         pa.array(op, pa.string()))
        live = tmp_path / "live"
        live.mkdir()
        dl = str(tmp_path / "dead")

        def job():
            return {"job": {
                "content": {
                    "reader": {"name": "changelog", "parameter": {
                        "path": str(live), "epochSize": 500,
                        "tail": {"pollInterval": 0.05, "idlePolls": 1}}},
                    "writer": {"name": "lake_upsert", "parameter": {
                        "path": str(tmp_path / "lake"),
                        "numPartitions": 4}},
                },
                "setting": {"deadLetterDir": dl,
                            "errorLimit": {"record": 100}},
            }}

        pq.write_table(t.slice(0, 1000), str(live / "chunk-0.parquet"))
        rep1 = run_job(job())
        assert rep1["ok"] and rep1["result"]["dead_lettered"] == 5
        pq.write_table(t.slice(1000, 1000), str(live / "chunk-1.parquet"))
        rep2 = run_job(job())
        assert rep2["ok"]
        # pre-fix this counted 12 (the whole [0, 2000) range)
        assert rep2["result"]["dead_lettered"] == 7
        assert rep2["counters"]["dirty"] == 7


class TestScd2History:
    """SCD Type-2 validity intervals from a change stream, pinned against
    a pandas lead() oracle over randomized changelogs."""

    def _changelog(self, seed=11, n=3000, n_convs=40, max_turns=6):
        rng = np.random.default_rng(seed)
        lsn = np.arange(n, dtype=np.int64)
        conv = np.char.add("c", rng.integers(0, n_convs, n).astype("U4"))
        turn = rng.integers(0, max_turns, n).astype(np.int32)
        op = rng.choice(np.array(["I", "U", "D"], dtype=object), n,
                        p=[0.5, 0.4, 0.1])
        ts = pd.to_datetime(
            1_700_000_000_000 + lsn * 10
            + rng.integers(-3, 4, n) * 2, unit="ms")
        text = np.char.add("v", lsn.astype("U8")).astype(object)
        text[op == "D"] = None
        return pa.table({
            "lsn": lsn, "op": pa.array(op, pa.string()),
            "conv_id": pa.array(conv.astype(object), pa.string()),
            "turn_idx": turn,
            "role": pa.array(["user"] * n, pa.string()),
            "text": pa.array(text, pa.string()),
            "tool": pa.array([None] * n, pa.string()),
            "ts": pa.array(ts),
        })

    def _oracle(self, t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas().sort_values(
            ["conv_id", "turn_idx", "ts", "lsn"], kind="stable")
        g = df.groupby(["conv_id", "turn_idx"], sort=False)
        df["valid_to"] = g["ts"].shift(-1)
        df["closed_by_lsn"] = g["lsn"].shift(-1)
        df["is_current"] = df["closed_by_lsn"].isna()
        out = df[df["op"] != "D"].rename(
            columns={"ts": "valid_from", "lsn": "version_lsn"})
        cols = ["conv_id", "turn_idx", "role", "text", "tool", "valid_from",
                "valid_to", "version_lsn", "closed_by_lsn", "is_current"]
        return (out[cols].sort_values("version_lsn")
                .reset_index(drop=True))

    @pytest.mark.parametrize("salt_by_turn", [False, True])
    def test_matches_pandas_lead_oracle(self, ray_session, salt_by_turn):
        import ray.data as rd

        from datax_ray.cdc.scd import scd2_history

        t = self._changelog()
        got = (scd2_history(rd.from_arrow(t).repartition(6),
                            num_partitions=5, salt_by_turn=salt_by_turn)
               .to_pandas().sort_values("version_lsn")
               .reset_index(drop=True))
        ora = self._oracle(t)
        got["closed_by_lsn"] = got["closed_by_lsn"].astype("float64")
        pd.testing.assert_frame_equal(got, ora, check_dtype=False)

    def test_delete_closes_without_opening(self, ray_session):
        import ray.data as rd

        from datax_ray.cdc.scd import scd2_history

        ts = pd.to_datetime([1, 2, 3], unit="s")
        t = pa.table({
            "lsn": pa.array([0, 1, 2], pa.int64()),
            "op": pa.array(["I", "D", "I"], pa.string()),
            "conv_id": pa.array(["a", "a", "a"], pa.string()),
            "turn_idx": pa.array([0, 0, 0], pa.int32()),
            "role": pa.array(["user", None, "user"], pa.string()),
            "text": pa.array(["x", None, "y"], pa.string()),
            "tool": pa.array([None, None, None], pa.string()),
            "ts": pa.array(ts),
        })
        got = (scd2_history(rd.from_arrow(t), num_partitions=2)
               .to_pandas().sort_values("version_lsn")
               .reset_index(drop=True))
        # two versions: lsn 0 closed by the delete, lsn 2 reopened+current
        assert list(got["version_lsn"]) == [0, 2]
        assert got.loc[0, "valid_to"] == ts[1]
        assert got.loc[0, "closed_by_lsn"] == 1
        assert not got.loc[0, "is_current"]
        assert pd.isna(got.loc[1, "valid_to"])
        assert got.loc[1, "is_current"]

    def test_current_rows_equal_lww_state(self, ray_session):
        """The SCD2 table's is_current slice must equal the LWW merge —
        the two operators are views of the same fold."""
        import ray.data as rd

        from datax_ray.cdc.merge import lww_merge
        from datax_ray.cdc.scd import scd2_history

        t = self._changelog(seed=23)
        cur = (scd2_history(rd.from_arrow(t), num_partitions=4)
               .to_pandas().query("is_current")
               [["conv_id", "turn_idx", "role", "text", "tool"]]
               .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))
        lww = (lww_merge(rd.from_arrow(t), num_partitions=4)
               .to_pandas()[["conv_id", "turn_idx", "role", "text", "tool"]]
               .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))
        pd.testing.assert_frame_equal(cur, lww, check_dtype=False)


class TestIncrementalDedup:
    """Streaming dedup against the sharded fingerprint index
    (ops/incdedup.py)."""

    def test_shard_probe_insert_and_pending_consolidation(self):
        from datax_ray.ops.incdedup import FingerprintIndexShard

        sh = FingerprintIndexShard(rebuild_ratio=0.5)
        fps1 = np.array(["a", "b", "c"], dtype=object)
        out1 = sh.check_and_insert(fps1, np.array([10, 11, 12]))
        assert list(out1) == [10, 11, 12]
        # re-probe: existing owners win; new key inserted
        out2 = sh.check_and_insert(
            np.array(["b", "d"], dtype=object), np.array([99, 13]))
        assert list(out2) == [11, 13]
        # probe keys living only in the pending chunk
        out3 = sh.check_and_insert(
            np.array(["d", "e"], dtype=object), np.array([77, 14]))
        assert list(out3) == [13, 14]
        assert sh.size() == 5

    def _epochs(self, ray_session):
        import ray.data as rd

        def tbl(ids, texts):
            return rd.from_arrow(pa.table({
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(texts, pa.string()),
            })).repartition(3)

        e0 = tbl([3, 1, 2], ["xx", "yy", "zz"])
        # within-epoch dup ("pp" twice) + cross-epoch dup ("yy")
        e1 = tbl([12, 10, 11], ["pp", "pp", "yy"])
        # later epoch re-sends an epoch-1 text and an epoch-0 text
        e2 = tbl([20, 21], ["pp", "zz"])
        return [e0, e1, e2]

    def test_epoch_order_and_min_id_semantics(self, ray_session):
        from datax_ray.ops.incdedup import incremental_dedup

        out = (incremental_dedup(self._epochs(ray_session), num_shards=4)
               .to_pandas().set_index("doc_id").sort_index())
        # epoch 0: all unique
        assert not out.loc[[1, 2, 3], "is_dup"].any()
        # epoch 1: min-id 10 owns "pp"; 12 dups it; "yy" owned by 1
        assert not out.loc[10, "is_dup"]
        assert out.loc[12, "is_dup"] and out.loc[12, "first_doc_id"] == 10
        assert out.loc[11, "is_dup"] and out.loc[11, "first_doc_id"] == 1
        # epoch 2: both dups of earlier epochs
        assert out.loc[20, "is_dup"] and out.loc[20, "first_doc_id"] == 10
        assert out.loc[21, "is_dup"] and out.loc[21, "first_doc_id"] == 2
        assert len(out) == 8

    def test_shard_spill_forced_same_results(self, tmp_path):
        """A memory-capped shard spills sorted runs to disk and returns
        exactly what the all-RAM shard returns."""
        from datax_ray.ops.incdedup import FingerprintIndexShard

        rng = np.random.default_rng(5)
        ram = FingerprintIndexShard()
        capped = FingerprintIndexShard(
            rebuild_ratio=0.1, max_mem_keys=8, spill_dir=str(tmp_path))
        universe = np.array([f"{i:032x}" for i in range(60)], dtype=object)
        next_id = 1000
        for _ in range(12):
            ks = rng.choice(universe, size=10, replace=False)
            ids = np.arange(next_id, next_id + 10)
            next_id += 10
            a = ram.check_and_insert(ks.copy(), ids.copy())
            b = capped.check_and_insert(ks.copy(), ids.copy())
            assert list(a) == list(b)
        st = capped.stats()
        assert st["n_runs"] >= 1 and st["spilled_keys"] > 0
        assert st["mem_keys"] <= 8 + 10  # heap + one pending chunk
        assert capped.size() == ram.size()

    def test_incremental_dedup_spill_matches_memory(self, ray_session,
                                                    tmp_path):
        from datax_ray.ops.incdedup import incremental_dedup

        a = (incremental_dedup(self._epochs(ray_session), num_shards=2)
             .to_pandas().sort_values("doc_id").reset_index(drop=True))
        b = (incremental_dedup(self._epochs(ray_session), num_shards=2,
                               max_mem_keys=1, spill_dir=str(tmp_path))
             .to_pandas().sort_values("doc_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(a, b)

    def test_fast_and_md5_fingerprints_agree(self, ray_session):
        from datax_ray.ops.incdedup import incremental_dedup

        a = (incremental_dedup(self._epochs(ray_session), num_shards=4,
                               fingerprint_mode="fast")
             .to_pandas().sort_values("doc_id").reset_index(drop=True))
        b = (incremental_dedup(self._epochs(ray_session), num_shards=4,
                               fingerprint_mode="md5")
             .to_pandas().sort_values("doc_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(a, b)


class TestBm25:
    """BM25 scorer (ops/ranking.py) vs a straight-line python reference."""

    TEXTS = [
        "table scan merge table", "nothing relevant here",
        "table", "", None, "merge merge merge scan",
        "the table of tables",  # 'tables' must NOT match \btable\b
        "TABLE Scan MERGE",     # case folding
    ]

    def _reference(self, texts, terms, k1=1.2, b=0.75):
        import math
        import re as _re

        toks = [(t or "").lower() for t in texts]
        dls = [len(_re.findall(r"\S+", t)) for t in toks]
        tfs = [[len(_re.findall(rf"\b{q}\b", t)) for t in toks]
               for q in terms]
        n = len(texts)
        avgdl = sum(dls) / n
        out = []
        for i in range(n):
            s = 0.0
            for qi, q in enumerate(terms):
                df = sum(1 for v in tfs[qi] if v > 0)
                idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
                tf = float(tfs[qi][i])
                s = s + (idf * (tf * (k1 + 1.0))) / (
                    tf + k1 * ((1.0 - b) + (b * dls[i]) / avgdl))
            out.append(round(s, 6))
        return out

    def test_matches_reference(self, ray_session):
        import ray.data as rd

        from datax_ray.ops.ranking import bm25_scores

        terms = ["table", "scan", "merge"]
        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array(range(len(self.TEXTS)), pa.int64()),
            "text": pa.array(self.TEXTS, pa.string()),
        })).repartition(3)
        got = (bm25_scores(ds, terms).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        ref = self._reference(self.TEXTS, terms)
        np.testing.assert_allclose(got["bm25"].to_numpy(), ref,
                                   rtol=0, atol=1.5e-6)
        # zero-match docs score 0; the shortest all-term doc scores
        # highest (BM25 length normalization)
        assert got.loc[1, "bm25"] == 0.0 and got.loc[4, "bm25"] == 0.0
        assert got["bm25"].idxmax() == 7

    def test_corpus_stats(self, ray_session):
        import ray.data as rd

        from datax_ray.ops.ranking import corpus_stats

        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array(range(len(self.TEXTS)), pa.int64()),
            "text": pa.array(self.TEXTS, pa.string()),
        })).repartition(4)
        st = corpus_stats(ds, ["table", "merge"])
        assert st["n_docs"] == 8
        assert st["df"] == [4, 3]  # 'tables' and None/'' excluded

    def test_rejects_regex_special_terms(self, ray_session):
        import ray.data as rd

        from datax_ray.ops.ranking import bm25_scores

        ds = rd.from_arrow(pa.table({"doc_id": [1], "text": ["x"]}))
        with pytest.raises(ValueError, match="alphanumeric"):
            bm25_scores(ds, ["a.b"]).take_all()


class TestProfileColumns:
    def test_profile_mixed_types_with_nulls(self, ray_session):
        import ray.data as rd

        from datax_ray.ops.profile import profile_columns

        t = pa.table({
            "i": pa.array([9, 10, None, 2, 100], pa.int64()),
            "s": pa.array(["b", None, "a", "zz", ""], pa.string()),
        })
        out = profile_columns(rd.from_arrow(t).repartition(3),
                              ["i", "s"]).to_pandas().set_index("column")
        # numeric fold must be numeric order (2 < 9 < 10 < 100), not
        # lexicographic over stringified partials
        assert out.loc["i", "min_value"] == "2"
        assert out.loc["i", "max_value"] == "100"
        assert out.loc["i", "n_nulls"] == 1 and out.loc["i", "n_rows"] == 5
        assert pd.isna(out.loc["i", "len_sum"])
        assert out.loc["s", "min_value"] == ""
        assert out.loc["s", "max_value"] == "zz"
        assert out.loc["s", "len_sum"] == 4

    def test_all_null_column(self, ray_session):
        import ray.data as rd

        from datax_ray.ops.profile import profile_columns

        t = pa.table({"x": pa.array([None, None], pa.string())})
        out = profile_columns(rd.from_arrow(t), ["x"]).to_pandas()
        assert out.loc[0, "n_nulls"] == 2
        assert pd.isna(out.loc[0, "min_value"])

    def test_float_scientific_and_inf_partials(self, ray_session):
        """Float partials whose str() is scientific notation or inf must
        refold by column type (regression: int('1e-05') crashed)."""
        import ray.data as rd

        from datax_ray.ops.profile import profile_columns

        t = pa.table({"f": pa.array(
            [1e-05, float("inf"), 3.5, -2e30], pa.float64())})
        out = (profile_columns(rd.from_arrow(t).repartition(4), ["f"])
               .to_pandas().set_index("column"))
        assert out.loc["f", "min_value"] == "-2e+30"
        assert out.loc["f", "max_value"] == "inf"


class TestKmeans:
    """Distributed Lloyd iterations (ops/clustering.py) vs an in-memory
    reference on the same init."""

    def _blobs(self, seed=5, n=600, k=4, dim=8, spread=0.05):
        rng = np.random.default_rng(seed)
        centers = rng.normal(0, 1, (k, dim)) * 4
        labels = rng.integers(0, k, n)
        vecs = centers[labels] + rng.normal(0, spread, (n, dim))
        return vecs.astype(np.float32), labels

    def _reference(self, vecs, init, iters):
        c = init.astype(np.float64)
        v = vecs.astype(np.float64)
        for _ in range(iters):
            d = ((v[:, None, :] - c[None, :, :]) ** 2).sum(-1)
            a = d.argmin(1)
            nc = c.copy()
            for j in range(len(c)):
                if (a == j).any():
                    nc[j] = v[a == j].mean(0)
            c = nc
        d = ((v[:, None, :] - c[None, :, :]) ** 2).sum(-1)
        return d.argmin(1), c

    def test_matches_inmemory_lloyd(self, ray_session):
        import ray.data as rd

        from datax_ray.ops.clustering import kmeans

        vecs, _ = self._blobs()
        init = vecs[:4]
        ds = rd.from_arrow(pa.table({
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        })).repartition(5)
        got_ds, got_c = kmeans(ds, init, iters=3)
        got = (got_ds.to_pandas().sort_values("vec_id")
               .reset_index(drop=True)["cluster"].to_numpy())
        want_a, want_c = self._reference(vecs, init, 3)
        np.testing.assert_array_equal(got, want_a)
        np.testing.assert_allclose(got_c, want_c, rtol=1e-12)

    def test_recovers_separated_blobs(self, ray_session):
        import ray.data as rd

        from datax_ray.ops.clustering import kmeans

        vecs, labels = self._blobs(seed=9, spread=0.01)
        # init with one member of each true cluster → exact recovery
        init = np.stack([vecs[labels == j][0] for j in range(4)])
        ds = rd.from_arrow(pa.table({
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        })).repartition(4)
        got_ds, _ = kmeans(ds, init, iters=2)
        got = (got_ds.to_pandas().sort_values("vec_id")
               .reset_index(drop=True)["cluster"].to_numpy())
        np.testing.assert_array_equal(got, labels)

    def test_empty_cluster_keeps_centroid(self, ray_session):
        import ray.data as rd

        from datax_ray.ops.clustering import kmeans_fit

        vecs = np.array([[0.0, 0.0], [0.1, 0.0], [10.0, 10.0]],
                        dtype=np.float32)
        init = np.array([[0.0, 0.0], [10.0, 10.0], [99.0, 99.0]])
        ds = rd.from_arrow(pa.table({
            "vec_id": pa.array([0, 1, 2], pa.int64()),
            "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        }))
        c = kmeans_fit(ds, init, iters=1)
        np.testing.assert_allclose(c[2], [99.0, 99.0])  # never assigned
        np.testing.assert_allclose(c[0], [0.05, 0.0])


@pytest.mark.usefixtures("ray_session")
class TestRankOps:
    """grouped_topk and window_funcs vs pandas references (groupby.head,
    shift, cumsum, rolling, rank method='min')."""

    def _frame(self, n=20000, seed=0):
        import pandas as pd

        rng = np.random.default_rng(seed)
        return pd.DataFrame({
            "g": rng.integers(0, 37, n),
            "v": rng.integers(0, 10_000, n),
            "id": np.arange(n),
        })

    def _ds(self, df, parts=9):
        import ray.data as rd

        return rd.from_arrow(
            pa.Table.from_pandas(df, preserve_index=False)
            .replace_schema_metadata(None)).repartition(parts)

    def test_grouped_topk_matches_pandas(self):
        import pandas as pd

        from datax_ray.ops.rank import grouped_topk

        df = self._frame()
        out = grouped_topk(self._ds(df), group_cols="g",
                           order_cols=["v", "id"],
                           descending=[True, False], k=5,
                           num_partitions=16).to_pandas()
        want = (df.sort_values(["g", "v", "id"],
                               ascending=[True, False, True])
                  .groupby("g").head(5))
        key = ["g", "v", "id"]
        a = out.sort_values(key).reset_index(drop=True)
        b = want.sort_values(key).reset_index(drop=True)
        pd.testing.assert_frame_equal(a[key], b[key], check_dtype=False)

    def test_grouped_topk_small_groups_survive(self):
        from datax_ray.ops.rank import grouped_topk

        df = self._frame(n=40)  # 37 groups, most have ~1 row
        out = grouped_topk(self._ds(df, parts=4), group_cols="g",
                           order_cols="id", descending=False, k=10,
                           num_partitions=4).to_pandas()
        assert len(out) == 40  # k larger than any group: nothing dropped

    def test_window_funcs_match_pandas(self):
        import pandas as pd

        from datax_ray.ops.rank import window_funcs

        df = self._frame()
        out = window_funcs(
            self._ds(df), partition_cols="g", order_cols="id",
            funcs={
                "rn": ("row_number",),
                "prev_v": ("lag", "v", 1),
                "next_v": ("lead", "v", 2),
                "cum_v": ("cumsum", "v"),
                "mv3": ("moving_avg", "v", 3),
                "ms3": ("moving_sum", "v", 3),
            }, num_partitions=16).to_pandas()
        out = out.sort_values(["g", "id"]).reset_index(drop=True)
        w = df.sort_values(["g", "id"]).reset_index(drop=True)
        gb = w.groupby("g")
        w["rn"] = gb.cumcount() + 1
        w["prev_v"] = gb["v"].shift(1)
        w["next_v"] = gb["v"].shift(-2)
        w["cum_v"] = gb["v"].cumsum().astype(float)
        roll = gb["v"].rolling(3, min_periods=1)
        w["mv3"] = roll.mean().reset_index(level=0, drop=True)
        w["ms3"] = roll.sum().reset_index(level=0, drop=True)
        for c in ["rn", "prev_v", "next_v", "cum_v", "mv3", "ms3"]:
            pd.testing.assert_series_equal(out[c], w[c], check_dtype=False,
                                           check_names=False)

    def test_rank_with_ties(self):
        import pandas as pd

        from datax_ray.ops.rank import window_funcs

        df = self._frame()
        df["tie"] = df["v"] % 7  # heavy ties
        out = window_funcs(
            self._ds(df), partition_cols="g", order_cols=["tie", "id"],
            funcs={"rk": ("rank", ["tie"])},
            num_partitions=16).to_pandas()
        want = df.copy()
        want["rk"] = want.groupby("g")["tie"].rank(method="min").astype(int)
        key = ["g", "tie", "id"]
        a = out.sort_values(key).reset_index(drop=True)
        b = want.sort_values(key).reset_index(drop=True)
        pd.testing.assert_series_equal(a["rk"], b["rk"], check_dtype=False,
                                       check_names=False)

    def test_multi_column_partition(self):
        import pandas as pd

        from datax_ray.ops.rank import window_funcs

        df = self._frame(n=5000)
        df["g2"] = df["v"] % 3
        out = window_funcs(
            self._ds(df), partition_cols=["g", "g2"], order_cols="id",
            funcs={"rn": ("row_number",)}, num_partitions=8).to_pandas()
        out = out.sort_values(["g", "g2", "id"]).reset_index(drop=True)
        w = df.sort_values(["g", "g2", "id"]).reset_index(drop=True)
        w["rn"] = w.groupby(["g", "g2"]).cumcount() + 1
        pd.testing.assert_series_equal(out["rn"], w["rn"],
                                       check_dtype=False, check_names=False)

    def test_unknown_function_raises(self):
        from datax_ray.ops.rank import window_funcs

        ds = self._ds(self._frame(n=100), parts=1)
        with pytest.raises(Exception, match="unknown window function"):
            window_funcs(ds, partition_cols="g", order_cols="id",
                         funcs={"x": ("mode_of_the_universe",)},
                         num_partitions=2).to_pandas()


@pytest.mark.usefixtures("ray_session")
class TestLookupTransform:
    """Broadcast dimension enrichment (transforms/lookup.py): vectorized
    order-preserving probe, left-join nulls, required→dirty routing, and
    the driver-side ray.put broadcast pre-pass."""

    def _dim(self):
        return pa.table({
            "id": pa.array([1, 2, 3], pa.int64()),
            "seg": pa.array(["a", "b", "c"]),
        })

    def test_left_join_with_nulls(self):
        from datax_ray.transforms.lookup import Lookup

        lk = Lookup(self._dim(), key="k", dim_key="id")
        batch = pa.table({"k": pa.array([3, 99, 1], pa.int64())})
        out = lk.apply(batch)
        assert out["seg"].to_pylist() == ["c", None, "a"]
        assert out["k"].to_pylist() == [3, 99, 1]  # order preserved

    def test_inline_table_cache_evicted_on_gc(self):
        """The probe cache keys inline tables by id(); the weakref
        finalizer must evict the entry when the table dies so a recycled
        id can never hit a stale index (regression)."""
        import gc

        from datax_ray.transforms import lookup as L

        dim = self._dim()
        lk = L.Lookup(dim, key="k", dim_key="id")
        lk.apply(pa.table({"k": pa.array([1], pa.int64())}))
        key = (id(dim), "id", ())
        assert key in L._PROBE_CACHE
        del lk, dim
        gc.collect()
        assert key not in L._PROBE_CACHE

    def test_required_routes_dirty(self, tmp_path):
        from datax_ray.transforms import TransformChain
        from datax_ray.transforms.lookup import Lookup

        lk = Lookup(self._dim(), key="k", dim_key="id", required=True)
        chain = TransformChain([lk], dead_letter_dir=str(tmp_path / "dl"))
        batch = pa.table({"k": pa.array([1, 42, 2], pa.int64())})
        out = chain(batch)
        assert out["k"].to_pylist() == [1, 2]  # 42 dead-lettered
        import glob
        assert glob.glob(str(tmp_path / "dl" / "*.parquet"))

    def test_duplicate_dim_key_raises(self):
        from datax_ray.transforms.lookup import Lookup

        dim = pa.table({"id": pa.array([1, 1], pa.int64()),
                        "v": pa.array([1, 2], pa.int64())})
        lk = Lookup(dim, key="k", dim_key="id")
        with pytest.raises(ValueError, match="not unique"):
            lk.apply(pa.table({"k": pa.array([1], pa.int64())}))

    def test_broadcast_specs_put_once(self, tmp_path):
        import pyarrow.parquet as pq

        from datax_ray.transforms import build_transform
        from datax_ray.transforms.lookup import broadcast_lookup_specs

        p = str(tmp_path / "dim.parquet")
        pq.write_table(self._dim(), p)
        specs = broadcast_lookup_specs([
            {"name": "lookup", "parameter": {
                "path": p, "key": "k", "dimKey": "id",
                "columns": ["seg"]}},
            {"name": "dx_pad", "parameter": {
                "column": "seg", "pad_type": "r", "length": 4,
                "pad_string": "x"}},
        ])
        import ray
        assert isinstance(specs[0]["parameter"]["table"], ray.ObjectRef)
        assert "path" not in specs[0]["parameter"]
        assert specs[1]["name"] == "dx_pad"  # untouched
        t = build_transform(specs[0])
        out = t.apply(pa.table({"k": pa.array([2], pa.int64())}))
        assert out["seg"].to_pylist() == ["b"]

    def test_cdc_replay_with_lookup(self, tmp_path):
        """Enrichment INSIDE the CDC exchange: every lake row carries the
        dimension column; the oracle is the pandas merge of the folded
        events with the dim."""
        import pyarrow.parquet as pq

        from datax_ray.cdc.replay import replay_files
        from datax_ray.sinks.lake import read_lake_table
        from datax_ray.sources.generators import (
            ChangelogSpec,
            write_changelog_parquet,
        )

        cl = write_changelog_parquet(
            ChangelogSpec(n_events=3000, n_convs=40, max_turns=6,
                          n_blocks=2, seed=11),
            str(tmp_path / "cl"))
        # dim: conv_id -> owner (generator ids are conv_ + 8-digit zfill)
        convs = [f"conv_{i:08d}" for i in range(40)]
        dimp = str(tmp_path / "dim.parquet")
        pq.write_table(pa.table({
            "conv_id": pa.array(convs),
            "owner": pa.array([f"team_{i % 5}" for i in range(40)]),
        }), dimp)
        lake = str(tmp_path / "lake")
        replay_files(cl, lake_dir=lake, max_lsn_exclusive=3000,
                     num_partitions=4, epoch_size=1500, compact_every=0,
                     transform_specs=[{"name": "lookup", "parameter": {
                         "path": dimp, "key": "conv_id",
                         "columns": ["owner"]}}])
        t = read_lake_table(lake).to_pandas()
        assert len(t) > 0
        want = ("team_" + (t["conv_id"].str.split("_").str[1].astype(int)
                           % 5).astype(str))
        assert (t["owner"] == want).all()


@pytest.mark.usefixtures("ray_session")
class TestBackfill:
    """lake.backfill: partition-parallel in-place rewrite with
    per-partition manifest commits — new column everywhere, tombstones
    retained, idempotent rerun (no double-apply), contract violations
    raise."""

    def _lake(self, tmp_path, n=4000):
        from datax_ray.cdc.replay import replay_files
        from datax_ray.sources.generators import (
            ChangelogSpec,
            write_changelog_parquet,
        )

        cl = write_changelog_parquet(
            ChangelogSpec(n_events=n, n_convs=60, max_turns=8, n_blocks=2,
                          seed=29),
            str(tmp_path / "cl"))
        lake = str(tmp_path / "lake")
        replay_files(cl, lake_dir=lake, max_lsn_exclusive=n,
                     num_partitions=6, epoch_size=n // 2, compact_every=0)
        return lake

    @staticmethod
    def _add_len(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.append_column("text_len", pc.utf8_length(t["text"]))

    def test_adds_column_everywhere(self, tmp_path):
        from datax_ray.sinks.lake import backfill, read_lake_table

        lake = self._lake(tmp_path)
        before = read_lake_table(lake).to_pandas()
        rep = backfill(lake, self._add_len)
        assert rep["partitions"] > 0 and rep["skipped"] == 0
        after = read_lake_table(lake).to_pandas()
        assert len(after) == len(before)
        assert (after["text_len"] == after["text"].str.len()).all()
        # non-backfilled columns byte-identical
        a = after.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
        b = before.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
        assert (a["text"] == b["text"]).all()

    def test_rerun_is_noop(self, tmp_path):
        import pyarrow.compute as pc

        from datax_ray.sinks.lake import backfill, read_lake_table

        def bang(t: pa.Table) -> pa.Table:
            return t.set_column(
                t.column_names.index("text"), "text",
                pc.binary_join_element_wise(t["text"], "!", ""))

        lake = self._lake(tmp_path)
        backfill(lake, bang, tag="bang")
        rep2 = backfill(lake, bang, tag="bang")
        assert rep2["partitions"] == 0 and rep2["skipped"] > 0
        t = read_lake_table(lake).to_pandas()
        assert t["text"].str.endswith("!").all()
        assert not t["text"].str.endswith("!!").any()  # no double apply

    def test_tombstones_retained(self, tmp_path):
        import pyarrow.parquet as pq

        from datax_ray.sinks.lake import backfill
        from datax_ray.state.manifest import Manifest

        lake = self._lake(tmp_path)
        backfill(lake, self._add_len)
        m = Manifest.load(lake)
        ops = set()
        for p in range(m.num_partitions):
            for f in m.partition_files(p):
                assert "bf-_add_len-" in f or "bf-" in f
                ops |= set(pq.read_table(f, columns=["op"])["op"].to_pylist())
        assert "D" in ops  # deletes survive the rewrite as tombstones

    def test_contract_violations_raise(self, tmp_path):
        from datax_ray.sinks.lake import backfill

        lake = self._lake(tmp_path, n=1000)
        with pytest.raises(Exception, match="row count"):
            backfill(lake, lambda t: t.slice(0, max(t.num_rows - 1, 0)),
                     tag="shrink")
        with pytest.raises(Exception, match="preserve key"):
            backfill(lake, lambda t: t.drop_columns(["lsn"]), tag="droplsn")


@pytest.mark.usefixtures("ray_session")
class TestDenseRankNtile:
    """dense_rank / ntile vs DuckDB's window functions."""

    def test_match_duckdb(self):
        import duckdb
        import pandas as pd
        import ray.data as rd

        from datax_ray.ops.rank import window_funcs

        rng = np.random.default_rng(2)
        n = 8000
        df = pd.DataFrame({"g": rng.integers(0, 23, n),
                           "tie": rng.integers(0, 9, n),
                           "id": np.arange(n)})
        t = (pa.Table.from_pandas(df, preserve_index=False)
             .replace_schema_metadata(None))
        out = window_funcs(rd.from_arrow(t).repartition(7),
                           partition_cols="g", order_cols=["tie", "id"],
                           funcs={"dr": ("dense_rank", ["tie"]),
                                  "nt": ("ntile", 4)},
                           num_partitions=8).to_pandas()
        con = duckdb.connect()
        con.register("df", df)
        want = con.execute("""
          SELECT g, tie, id,
            dense_rank() OVER (PARTITION BY g ORDER BY tie) dr,
            ntile(4) OVER (PARTITION BY g ORDER BY tie, id) nt
          FROM df""").fetchdf()
        key = ["g", "tie", "id"]
        a = out.sort_values(key).reset_index(drop=True)
        b = want.sort_values(key).reset_index(drop=True)
        pd.testing.assert_series_equal(a["dr"], b["dr"], check_dtype=False,
                                       check_names=False)
        pd.testing.assert_series_equal(a["nt"], b["nt"], check_dtype=False,
                                       check_names=False)

    def test_ntile_tiny_partitions(self):
        import ray.data as rd

        from datax_ray.ops.rank import window_funcs

        # 3 rows into 4 tiles: tiles 1,2,3 (SQL: leftover tiles empty)
        t = pa.table({"g": pa.array([0, 0, 0], pa.int64()),
                      "id": pa.array([0, 1, 2], pa.int64())})
        out = (window_funcs(rd.from_arrow(t), partition_cols="g",
                            order_cols="id", funcs={"nt": ("ntile", 4)},
                            num_partitions=2)
               .to_pandas().sort_values("id"))
        assert out["nt"].tolist() == [1, 2, 3]


@pytest.mark.usefixtures("ray_session")
class TestPercentRankCumeDist:
    def test_match_duckdb(self):
        import duckdb
        import pandas as pd
        import ray.data as rd

        from datax_ray.ops.rank import window_funcs

        rng = np.random.default_rng(5)
        n = 6000
        df = pd.DataFrame({"g": rng.integers(0, 40, n),
                           "tie": rng.integers(0, 6, n),
                           "id": np.arange(n)})
        df.loc[0, "g"] = 999  # singleton partition: percent_rank -> 0.0
        t = (pa.Table.from_pandas(df, preserve_index=False)
             .replace_schema_metadata(None))
        out = window_funcs(rd.from_arrow(t).repartition(5),
                           partition_cols="g", order_cols=["tie", "id"],
                           funcs={"pr": ("percent_rank", ["tie"]),
                                  "cd": ("cume_dist", ["tie"])},
                           num_partitions=8).to_pandas()
        con = duckdb.connect()
        con.register("df", df)
        want = con.execute("""
          SELECT g, tie, id,
            percent_rank() OVER (PARTITION BY g ORDER BY tie) pr,
            cume_dist() OVER (PARTITION BY g ORDER BY tie) cd
          FROM df""").fetchdf()
        key = ["g", "tie", "id"]
        a = out.sort_values(key).reset_index(drop=True)
        b = want.sort_values(key).reset_index(drop=True)
        import pandas.testing as pdt
        pdt.assert_series_equal(a["pr"], b["pr"], check_dtype=False,
                                check_names=False)
        pdt.assert_series_equal(a["cd"], b["cd"], check_dtype=False,
                                check_names=False)
