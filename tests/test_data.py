"""Data layer tests: wrappers, HDF pack/read roundtrip, datamodule batching
and balancing."""

import numpy as np
import pytest

from conette_tpu.data.collate import CollateDict, pad_and_stack
from conette_tpu.data.datasets import (
    AACConcat,
    AACDuplicate,
    AACSubset,
    AACTransformWrapper,
    DummyAACDataset,
    WrapperSampler,
)
from conette_tpu.data.datamodule import HDFDataModule, Prefetcher
from conette_tpu.data.hdf import HDFDataset, get_hdf_fpaths, pack_to_hdf
from conette_tpu.tokenization import AACTokenizer


class TestWrappers:
    def test_subset(self):
        ds = DummyAACDataset(size=10)
        sub = AACSubset(ds, [1, 3, 5])
        assert len(sub) == 3
        assert sub.at(1, "fname") == ds.at(3, "fname")

    def test_concat(self):
        a, b = DummyAACDataset(size=4, seed=0), DummyAACDataset(size=6, seed=1)
        cat = AACConcat(a, b)
        assert len(cat) == 10
        assert cat.at(5, "fname") == b.at(1, "fname")

    def test_duplicate_oversamples(self):
        ds = DummyAACDataset(size=3)
        dup = AACDuplicate(ds, 8)
        assert len(dup) == 8
        assert dup.at(3, "fname") == ds.at(0, "fname")

    def test_wrapper_sampler_resample(self):
        ds = DummyAACDataset(size=20)
        s = WrapperSampler(ds, 5, seed=0)
        assert len(s) == 5
        first = [s.at(i, "fname") for i in range(5)]
        s.resample()
        second = [s.at(i, "fname") for i in range(5)]
        assert first != second  # overwhelmingly likely

    def test_transform_wrapper(self):
        ds = DummyAACDataset(size=4)
        w = AACTransformWrapper(ds, {"audio": lambda a: a * 0.0})
        assert np.all(w[0]["audio"] == 0.0)


class TestHDF:
    def test_pack_read_roundtrip(self, tmp_path):
        ds = DummyAACDataset(size=6, audio_frames=9)
        fpath = str(tmp_path / "dummy_train_test.hdf")
        pack_to_hdf(ds, fpath)
        loaded = HDFDataset(fpath)
        assert len(loaded) == 6
        assert set(loaded.column_names) == set(ds.column_names)
        np.testing.assert_allclose(loaded.at(2, "audio"), ds.at(2, "audio"))
        assert loaded.at(3, "captions") == ds.at(3, "captions")
        assert loaded.at(0, "dataset") == "dummy"

    def test_variable_length_audio(self, tmp_path):
        ds = DummyAACDataset(size=4, audio_frames=9)
        # make lens variable by trimming
        from conette_tpu.data.datasets import AACTransformWrapper

        trimmed = AACTransformWrapper(ds, {"audio": lambda a: a[:5]})
        fpath = str(tmp_path / "var.hdf")
        pack_to_hdf(trimmed, fpath)
        loaded = HDFDataset(fpath)
        assert loaded.at(0, "audio").shape[0] == 5

    def test_get_hdf_fpaths_error_lists_suffixes(self, tmp_path):
        (tmp_path / "clotho_dev_resample_mean_convnext_ident.hdf").touch()
        with pytest.raises(FileNotFoundError) as err:
            get_hdf_fpaths("clotho", ["dev"], str(tmp_path), "wrong_suffix")
        assert "resample_mean_convnext_ident" in str(err.value)

    def test_get_hdf_fpaths_ok(self, tmp_path):
        (tmp_path / "clotho_dev_s.hdf").touch()
        out = get_hdf_fpaths("clotho", ["dev"], str(tmp_path), "s")
        assert out["dev"].endswith("clotho_dev_s.hdf")


class TestCollate:
    def test_pad_and_stack_quantum_last_axis(self):
        arrays = [np.ones((3,)), np.ones((5,))]
        out, shapes = pad_and_stack(arrays, length_quantum=4)
        assert out.shape == (2, 8)
        assert shapes.tolist() == [[3], [5]]
        # 2-D (refs, len): quantum applies to len, not refs
        arrays2 = [np.ones((5, 3)), np.ones((5, 6))]
        out2, _ = pad_and_stack(arrays2, length_quantum=4)
        assert out2.shape == (2, 5, 8)

    def test_collate_dict(self):
        items = [
            {"audio": np.ones((3, 4), np.float32), "captions": np.asarray([1, 2]), "fname": "a"},
            {"audio": np.ones((5, 4), np.float32), "captions": np.asarray([1, 2, 3]), "fname": "b"},
        ]
        batch = CollateDict(pad_values={"captions": 0})(items)
        assert batch["audio"].shape == (2, 5, 4)
        assert batch["captions"].shape == (2, 3)
        assert batch["captions"][0, 2] == 0
        assert batch["fname"] == ["a", "b"]
        assert batch["audio_shape"].tolist() == [[3, 4], [5, 4]]


class TestDataModule:
    def _pack(self, tmp_path, name, size, seed):
        ds = DummyAACDataset(size=size, seed=seed, dataset_name=name)
        fpath = str(tmp_path / f"{name}_train_x.hdf")
        pack_to_hdf(ds, fpath)
        return fpath

    def test_train_batches_and_tokenizer_fit(self, tmp_path):
        fpath = self._pack(tmp_path, "clotho", 12, 0)
        tok = AACTokenizer()
        dm = HDFDataModule(tok, [fpath], bsize=4, seed=0)
        dm.setup_fit()
        assert tok.is_fit()
        batches = list(dm.train_batches(epoch=0))
        assert len(batches) == 3
        b = batches[0]
        assert b["audio"].shape[0] == 4
        assert b["captions"].dtype == np.int32
        assert b["captions"].shape[1] % 4 == 0  # caption quantum
        assert b["audio_lens"].shape == (4,)

    def test_train_batches_process_sharding(self, tmp_path):
        """DistributedSampler twin: rank r of N takes rows
        [r·bsize, (r+1)·bsize) of every global batch, so concatenating the
        per-rank batches reproduces the 1-process global batch row-for-row
        (used by multi-host ``main_train``; proven end-to-end in
        tests/test_multihost_fit_equality.py)."""
        fpath = self._pack(tmp_path, "clotho", 16, 0)

        def batches(rank, count, bsize):
            tok = AACTokenizer()
            dm = HDFDataModule(
                tok, [fpath], bsize=bsize, seed=0,
                process_rank=rank, process_count=count,
            )
            dm.setup_fit()
            return list(dm.train_batches(epoch=3))

        single = batches(0, 1, 8)
        r0 = batches(0, 2, 4)
        r1 = batches(1, 2, 4)
        assert len(single) == len(r0) == len(r1) == 2
        for bs, b0, b1 in zip(single, r0, r1):
            # multi-process batches are padded to FIXED global shapes
            # (caption_max_len / dataset-max audio length) so both ranks
            # collate identically; compare content up to the 1-proc width
            # and require pure padding beyond it
            assert b0["captions"].shape == b1["captions"].shape
            got = np.concatenate([b0["captions"], b1["captions"]], axis=0)
            w = bs["captions"].shape[1]
            np.testing.assert_array_equal(got[:, :w], bs["captions"])
            assert (got[:, w:] == 0).all()
            got_audio = np.concatenate([b0["audio"], b1["audio"]], axis=0)
            t = bs["audio"].shape[1]
            np.testing.assert_array_equal(got_audio[:, :t], bs["audio"])
            assert (got_audio[:, t:] == 0).all()

    def test_invalid_process_rank_raises(self, tmp_path):
        with pytest.raises(ValueError, match="process_rank"):
            HDFDataModule(
                AACTokenizer(), [], process_rank=2, process_count=2
            )

    def test_balancing_main_hdf_min(self, tmp_path):
        main = self._pack(tmp_path, "clotho", 8, 0)
        added = self._pack(tmp_path, "wavcaps", 20, 1)
        tok = AACTokenizer()
        dm = HDFDataModule(
            tok, [main, added], bsize=4, main_hdf_pattern="clotho",
            balance_mode="main_hdf_min",
        )
        dm.setup_fit()
        # main (8) + min(8, 20) added = 16
        assert len(dm.train_dataset) == 16

    def test_task_token_rewrite(self, tmp_path):
        fpath = self._pack(tmp_path, "clotho", 8, 0)
        tok = AACTokenizer()
        dm = HDFDataModule(
            tok, [fpath], bsize=4,
            task_token_fn=lambda item: 99,
        )
        dm.setup_fit()
        b = next(iter(dm.train_batches()))
        assert (b["captions"][:, 0] == 99).all()

    def test_eval_batches_mult_captions(self, tmp_path):
        fpath = self._pack(tmp_path, "clotho", 6, 0)
        tok = AACTokenizer()
        dm = HDFDataModule(tok, [fpath], val_fpaths=[fpath], bsize=4)
        dm.setup_fit()
        b = next(iter(dm.eval_batches("val")))
        assert b["mult_captions"].ndim == 3
        assert len(b["mult_references"]) == 4
        assert b["mult_captions"].shape[1] == 5  # n_refs

    def test_prefetcher(self):
        pf = Prefetcher(iter(range(10)), depth=2)
        assert list(pf) == list(range(10))


def test_prefetch_iterator_order_and_errors():
    from conette_tpu.data.prefetch import prefetch_iterator

    assert list(prefetch_iterator(iter(range(10)), depth=3)) == list(range(10))
    assert list(prefetch_iterator(iter([]), depth=2)) == []

    def boom():
        yield 1
        raise ValueError("source failed")

    it = prefetch_iterator(boom(), depth=2)
    assert next(it) == 1
    import pytest as _pytest

    with _pytest.raises(ValueError, match="source failed"):
        list(it)
