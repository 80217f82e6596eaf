"""Dataset-wrapper + balancing parity vs the reference's ACTUAL
``datasets/utils.py`` and the balance composition of
``datamodules/hdf.py:234-319``.

The wrappers decide WHAT the model trains on — the production
multi-dataset recipes (``expt=camw_cnext_bl_for_{c,a,ac}``) compose
AC+CL+MA+WC through AACConcat/AACDuplicate/WrapperSampler, so a semantics
divergence here silently changes the training distribution. This file
drives the reference's real classes next to ours on identical dummy
datasets, and asserts our ``HDFDataModule`` balance modes produce the
exact composition the reference's ``_setup_fit`` builds:

* ``main_hdf_duplicate`` (hdf.py:234-248): main duplicated IN PLACE to
  the sum of the others (only if smaller); others whole.
* ``main_hdf_min`` (hdf.py:249-269): others POOLED into one concat, ONE
  sampler draws ``n_added_data or len(main)`` items from the pool.
* ``main_hdf_balanced`` (hdf.py:271-311): each main a separate part,
  others pooled; every part equalized to exactly
  ``n_added_data or max(sizes)`` (duplicate if smaller, sample if bigger).
"""

from __future__ import annotations

import numpy as np
import pytest

from tests.reference_shim import load_reference_datasets

from conette_tpu.data.datasets import (
    AACConcat,
    AACDuplicate,
    AACSubset,
    DictDataset,
    WrapperSampler,
)


@pytest.fixture(scope="module")
def ref():
    return load_reference_datasets()


class _RefDummy:
    """AACDatasetLike for the reference wrappers."""

    def __init__(self, name: str, n: int, columns=("captions", "src")):
        self.name = name
        self.n = n
        self._columns = list(columns)

    @property
    def column_names(self):
        return list(self._columns)

    def at(self, idx, column=None):
        if column is None:
            return {c: self.at(idx, c) for c in self._columns}
        if isinstance(column, str):
            if column == "captions":
                return f"cap {idx} of {self.name}"
            if column == "src":
                return f"{self.name}:{idx}"
            raise KeyError(column)
        return {c: self.at(idx, c) for c in column}

    def __getitem__(self, idx):
        return self.at(idx)

    def __len__(self):
        return self.n


def _ours_dummy(name: str, n: int, columns=("captions", "src")):
    items = {
        "captions": [f"cap {i} of {name}" for i in range(n)],
        "src": [f"{name}:{i}" for i in range(n)],
    }
    return DictDataset({c: items[c] for c in columns})


def _all_srcs(ds):
    return [ds.at(i, "src") for i in range(len(ds))]


class TestWrappersVsActualCode:
    def test_concat_order_and_items(self, ref):
        r = ref.AACConcat(_RefDummy("a", 3), _RefDummy("b", 2), _RefDummy("c", 4))
        o = AACConcat(_ours_dummy("a", 3), _ours_dummy("b", 2), _ours_dummy("c", 4))
        assert len(r) == len(o) == 9
        assert _all_srcs(r) == _all_srcs(o)
        assert r.column_names == o.column_names

    def test_concat_column_intersection(self, ref):
        r = ref.AACConcat(
            _RefDummy("a", 2, ("captions", "src")),
            _RefDummy("b", 2, ("src",)),
        )
        o = AACConcat(
            _ours_dummy("a", 2, ("captions", "src")),
            _ours_dummy("b", 2, ("src",)),
        )
        assert r.column_names == o.column_names == ["src"]

    @pytest.mark.parametrize("n,target", [(3, 8), (3, 3), (5, 2), (4, 9)])
    def test_duplicate_index_mapping(self, ref, n, target):
        r = ref.AACDuplicate(_RefDummy("a", n), target)
        o = AACDuplicate(_ours_dummy("a", n), target)
        assert len(r) == len(o) == target
        assert _all_srcs(r) == _all_srcs(o)
        # both follow idx % n (datasets/utils.py:412-414)
        assert _all_srcs(o) == [f"a:{i % n}" for i in range(target)]

    def test_subset_mapping(self, ref):
        idxs = [4, 1, 3]
        r = ref.AACSubset(_RefDummy("a", 6), idxs)
        o = AACSubset(_ours_dummy("a", 6), idxs)
        assert len(r) == len(o) == 3
        assert _all_srcs(r) == _all_srcs(o) == ["a:4", "a:1", "a:3"]

    def test_sampler_without_replacement_and_reshuffle(self, ref):
        src_r, src_o = _RefDummy("a", 20), _ours_dummy("a", 20)
        r = ref.WrapperSampler(src_r, 8, generator=0)
        o = WrapperSampler(src_o, 8, seed=0)
        for s in (r, o):
            srcs = _all_srcs(s)
            assert len(s) == 8
            assert len(set(srcs)) == 8  # without replacement
            assert all(x.startswith("a:") for x in srcs)
        before_r, before_o = _all_srcs(r), _all_srcs(o)
        r.reset_indexes()
        o.resample()
        # a reshuffle of 8-of-20 items virtually never repeats exactly
        assert _all_srcs(r) != before_r
        assert _all_srcs(o) != before_o

    def test_sampler_requires_size_le_source(self, ref):
        # reference asserts len(source) >= size (datasets/utils.py:331);
        # ours caps (documented divergence: traced pools may undershoot)
        with pytest.raises(AssertionError):
            ref.WrapperSampler(_RefDummy("a", 4), 8)
        o = WrapperSampler(_ours_dummy("a", 4), 8)
        assert len(o) == 4


# --------------------------------------------------------------------------
# balance composition — our HDFDataModule vs the reference's _setup_fit
# recipe built from the reference's ACTUAL wrappers
# --------------------------------------------------------------------------


def _pack(tmp_path, name: str, n: int, seed: int):
    """Pack a tiny HDF with identifiable captions."""
    from conette_tpu.data.hdf import pack_to_hdf

    rng = np.random.default_rng(seed)
    ds = DictDataset(
        {
            "audio": [
                rng.standard_normal((6, 8)).astype("f4") for _ in range(n)
            ],
            "audio_lens": [6] * n,
            "captions": [
                [f"{name} item {i} ref {j}" for j in range(5)]
                for i in range(n)
            ],
            "dataset": [name] * n,
            "subset": ["train"] * n,
            "source": [None] * n,
            "fname": [f"{name}_{i}.wav" for i in range(n)],
        }
    )
    fpath = str(tmp_path / f"{name}_x.hdf")
    pack_to_hdf(ds, fpath)
    return fpath


def _srcs_of_train(dm):
    out = []
    ds = dm.train_dataset
    for i in range(len(ds)):
        refs = ds.at(i, "captions")
        cap = refs[0] if isinstance(refs, list) else refs
        out.append(str(cap).split(" item ")[0])
    return out


def _mk_dm(tmp_path, files, **kw):
    from conette_tpu.data.datamodule import HDFDataModule
    from conette_tpu.tokenization import AACTokenizer

    dm = HDFDataModule(AACTokenizer(), files, bsize=4, **kw)
    dm.setup_fit()
    return dm


class TestBalanceComposition:
    def test_main_hdf_min_pools_added(self, tmp_path, ref):
        """len(main)=6 with others 10+14: reference draws SIX items total
        from the 24-item pool — not six from each."""
        main = _pack(tmp_path, "clotho", 6, 0)
        a1 = _pack(tmp_path, "wavcaps", 10, 1)
        a2 = _pack(tmp_path, "macs", 14, 2)
        dm = _mk_dm(tmp_path, [main, a1, a2], main_hdf_min="clotho_x.hdf")
        srcs = _srcs_of_train(dm)
        assert len(srcs) == 12  # 6 main + 6 pooled-sample
        assert srcs[:6] == ["clotho"] * 6  # main first (hdf.py:268)
        added = srcs[6:]
        assert set(added) <= {"wavcaps", "macs"}
        # reference twin composition on its actual wrappers
        pooled = ref.AACConcat(_RefDummy("wavcaps", 10), _RefDummy("macs", 14))
        sampler = ref.WrapperSampler(pooled, 6, generator=0)
        train_ref = ref.AACConcat(_RefDummy("clotho", 6), sampler)
        assert len(train_ref) == len(srcs)

    def test_main_hdf_min_n_added_data(self, tmp_path):
        main = _pack(tmp_path, "clotho", 6, 0)
        a1 = _pack(tmp_path, "wavcaps", 10, 1)
        dm = _mk_dm(
            tmp_path, [main, a1], main_hdf_min="clotho_x.hdf", n_added_data=3
        )
        assert len(dm.train_dataset) == 9  # 6 main + 3 added

    def test_main_hdf_duplicate_in_place(self, tmp_path):
        """Main (4) duplicated to sum-of-others (10), keeping dataset
        order with others whole (hdf.py:234-248)."""
        a1 = _pack(tmp_path, "wavcaps", 10, 1)
        main = _pack(tmp_path, "clotho", 4, 0)
        dm = _mk_dm(
            tmp_path, [a1, main], main_hdf_duplicate="clotho_x.hdf"
        )
        srcs = _srcs_of_train(dm)
        assert len(srcs) == 20
        assert srcs[:10] == ["wavcaps"] * 10  # original order preserved
        assert srcs[10:] == ["clotho"] * 10

    def test_main_hdf_duplicate_noop_when_bigger(self, tmp_path):
        main = _pack(tmp_path, "clotho", 12, 0)
        a1 = _pack(tmp_path, "wavcaps", 5, 1)
        dm = _mk_dm(
            tmp_path, [main, a1], main_hdf_duplicate="clotho_x.hdf"
        )
        assert len(dm.train_dataset) == 17  # unchanged

    def test_main_hdf_balanced_equalizes_all(self, tmp_path):
        """mains [6, 10] + pooled others (14): n = max = 14; every part
        equalized to exactly 14 (duplicate the smaller mains, sample the
        bigger pool) => 42 (hdf.py:271-311)."""
        m1 = _pack(tmp_path, "audiocaps", 6, 0)
        m2 = _pack(tmp_path, "clotho", 10, 1)
        a1 = _pack(tmp_path, "wavcaps", 9, 2)
        a2 = _pack(tmp_path, "macs", 5, 3)
        dm = _mk_dm(
            tmp_path,
            [m1, m2, a1, a2],
            main_hdf_balanced=["audiocaps_x.hdf", "clotho_x.hdf"],
        )
        srcs = _srcs_of_train(dm)
        assert len(srcs) == 42
        assert srcs[:14] == ["audiocaps"] * 14  # duplicated 6 -> 14
        assert srcs[14:28] == ["clotho"] * 14  # duplicated 10 -> 14
        assert set(srcs[28:]) <= {"wavcaps", "macs"}
        # duplication pattern is idx % n like AACDuplicate
        caps = [dm.train_dataset.at(i, "captions")[0] for i in range(14)]
        assert caps[6:12] == caps[:6]

    def test_main_hdf_balanced_n_added_data(self, tmp_path):
        m1 = _pack(tmp_path, "audiocaps", 6, 0)
        a1 = _pack(tmp_path, "wavcaps", 9, 2)
        dm = _mk_dm(
            tmp_path,
            [m1, a1],
            main_hdf_balanced=["audiocaps_x.hdf"],
            n_added_data=8,
        )
        srcs = _srcs_of_train(dm)
        assert len(srcs) == 16
        assert srcs[:8] == ["audiocaps"] * 8  # 6 -> 8 duplicated
        assert srcs[8:] == ["wavcaps"] * 8  # 9 -> 8 sampled

    def test_main_hdf_balanced_mains_keep_list_order(self, tmp_path):
        """The reference iterates main_hdf_balanced, not train_hdfs, when
        assembling the main parts (hdf.py:277-311) — the shipped for_ac
        recipe lists clotho first in train_hdfs but audiocaps first in
        main_hdf_balanced, so composition order follows the mode key."""
        m_cl = _pack(tmp_path, "clotho", 6, 0)
        m_ac = _pack(tmp_path, "audiocaps", 6, 1)
        a1 = _pack(tmp_path, "wavcaps", 6, 2)
        dm = _mk_dm(
            tmp_path,
            [m_cl, m_ac, a1],  # train order: clotho, audiocaps, others
            main_hdf_balanced=["audiocaps_x.hdf", "clotho_x.hdf"],
        )
        srcs = _srcs_of_train(dm)
        assert srcs[:6] == ["audiocaps"] * 6  # list order wins
        assert srcs[6:12] == ["clotho"] * 6

    def test_n_added_data_zero_honored(self, tmp_path):
        """The reference honors an explicit 0 ('if n_added_data is not
        None', hdf.py:256-259): train on the main set only."""
        main = _pack(tmp_path, "clotho", 6, 0)
        a1 = _pack(tmp_path, "wavcaps", 10, 1)
        dm = _mk_dm(
            tmp_path, [main, a1], main_hdf_min="clotho_x.hdf", n_added_data=0
        )
        assert len(dm.train_dataset) == 6

    def test_duplicate_listing_counts_second_copy_as_added(self, tmp_path):
        """train_hdfs.index(name) marks only the FIRST occurrence as main
        (hdf.py:250): a second listing of the same file joins the pool."""
        main = _pack(tmp_path, "clotho", 6, 0)
        dm = _mk_dm(
            tmp_path, [main, main], main_hdf_min="clotho_x.hdf"
        )
        # 6 main + 6 sampled from the 6-item pool (the second copy)
        assert len(dm.train_dataset) == 12

    def test_balance_mode_without_added_raises_clearly(self, tmp_path):
        main = _pack(tmp_path, "clotho", 6, 0)
        with pytest.raises(ValueError, match="non-main"):
            _mk_dm(tmp_path, [main], main_hdf_min="clotho_x.hdf")

    def test_balanced_samplers_decorrelated(self, tmp_path):
        """Two same-sized oversampled parts must not draw lockstep
        permutations (the reference uses independent unseeded generators,
        utils.py:329-343; we keep determinism with per-part seed offsets)."""
        m1 = _pack(tmp_path, "audiocaps", 12, 0)
        m2 = _pack(tmp_path, "clotho", 12, 1)
        a1 = _pack(tmp_path, "wavcaps", 4, 2)
        dm = _mk_dm(
            tmp_path,
            [m1, m2, a1],
            main_hdf_balanced=["audiocaps_x.hdf", "clotho_x.hdf"],
            n_added_data=6,
        )
        s1, s2 = dm._samplers[0], dm._samplers[1]
        assert list(s1._indexes) != list(s2._indexes)

    def test_bulk_column_read_matches_per_row(self, tmp_path):
        from conette_tpu.data.hdf import HDFDataset

        fpath = _pack(tmp_path, "clotho", 7, 0)
        ds = HDFDataset(fpath)
        assert ds.column("captions") == [
            ds.at(i, "captions") for i in range(7)
        ]
        assert ds.column("fname") == [ds.at(i, "fname") for i in range(7)]

    def test_mode_keys_exclusive(self, tmp_path):
        from conette_tpu.data.datamodule import HDFDataModule
        from conette_tpu.tokenization import AACTokenizer

        with pytest.raises(ValueError, match="At most one"):
            HDFDataModule(
                AACTokenizer(),
                [],
                main_hdf_min="a.hdf",
                main_hdf_duplicate="b.hdf",
            )

    def test_missing_main_name_raises(self, tmp_path):
        main = _pack(tmp_path, "clotho", 4, 0)
        with pytest.raises(ValueError, match="not in train_hdfs"):
            _mk_dm(tmp_path, [main], main_hdf_min="nope.hdf")

    def test_tokenizer_fit_on_raw_corpus_not_balanced_view(self, tmp_path):
        """The reference collects train_mrefs from the PRE-balance dataset
        list in train_hdfs order (hdf.py:224-231) and fits on that
        (hdf.py:330-332). The balanced view must not leak into the fit:
        under min mode it would (a) drop pool words the epoch-1 sampler
        missed — vocab SET, (b) reorder (main first regardless of its
        train_hdfs slot) — id ORDER."""
        from conette_tpu.tokenization import AACTokenizer

        # main is the SECOND file; pool 40 >> sample 4, so a
        # balanced-view fit would both miss words and reorder ids
        pool = _pack(tmp_path, "wavcaps", 40, 1)
        main = _pack(tmp_path, "clotho", 4, 0)
        dm = _mk_dm(tmp_path, [pool, main], main_hdf_min="clotho_x.hdf")

        raw = []
        for name, n in (("wavcaps", 40), ("clotho", 4)):
            for i in range(n):
                raw.extend(f"{name} item {i} ref {j}" for j in range(5))
        oracle = AACTokenizer()
        oracle.fit(raw)

        assert dm.tokenizer.get_vocab_size() == oracle.get_vocab_size()
        assert dm.tokenizer._stoi == oracle._stoi
        # the balanced view only surfaces 4-of-40 pool items, so every
        # "item N" numeral of the missed rows exists ONLY via the raw fit
        assert "39" in dm.tokenizer._stoi

    def test_reload_every_n_epochs_gates_resampling(self, tmp_path):
        """The reference re-draws added data only when Lightning rebuilds
        the dataloader (trainer.reload_dataloaders_every_n_epochs;
        fit_test.yaml:35 defaults 0, the camw_* recipes set 1 — reference
        hdf.py:180-187). With 0 every epoch trains on the fit-start draw;
        with 1 the epoch-k draw is a pure function of (seed, epoch), so a
        resumed run re-draws the same subset."""
        main = _pack(tmp_path, "clotho", 6, 0)
        a1 = _pack(tmp_path, "wavcaps", 30, 1)

        def added_caps(dm, epoch):
            for _ in dm.train_batches(epoch):
                pass
            return [dm.train_dataset.at(i, "captions")[0] for i in range(6, 12)]

        dm0 = _mk_dm(tmp_path, [main, a1], main_hdf_min="clotho_x.hdf")
        assert dm0.reload_every_n_epochs == 0
        assert added_caps(dm0, 0) == added_caps(dm0, 1) == added_caps(dm0, 5)

        dm1 = _mk_dm(
            tmp_path, [main, a1], main_hdf_min="clotho_x.hdf",
            reload_every_n_epochs=1,
        )
        e1, e2 = added_caps(dm1, 1), added_caps(dm1, 2)
        assert e1 != e2
        # epoch draw is reproducible out of order (resume semantics)
        dm2 = _mk_dm(
            tmp_path, [main, a1], main_hdf_min="clotho_x.hdf",
            reload_every_n_epochs=1,
        )
        assert added_caps(dm2, 2) == e2

    def test_epoch_resample_changes_added_only(self, tmp_path):
        """reload_dataloaders_every_n_epochs=1 twin: resampling swaps the
        added items, never the main ones (hdf.py:180-187)."""
        main = _pack(tmp_path, "clotho", 6, 0)
        a1 = _pack(tmp_path, "wavcaps", 30, 1)
        dm = _mk_dm(tmp_path, [main, a1], main_hdf_min="clotho_x.hdf")
        first = [dm.train_dataset.at(i, "captions")[0] for i in range(12)]
        for s in dm._samplers:
            s.resample()
        second = [dm.train_dataset.at(i, "captions")[0] for i in range(12)]
        assert first[:6] == second[:6]
        assert first[6:] != second[6:]
