"""Collate parity vs the reference's ACTUAL ``datamodules/collate.py``.

Drives the real ``AdvancedCollateDict``/``CollateDict`` (via
``load_reference_collate``; torchoutil pad/stack helpers shimmed to their
documented semantics) next to our numpy ``CollateDict`` on identical item
dicts, asserting the padded batches, ``*_shape`` companions, and key
handling agree. Our collate additionally buckets lengths (quantum > 1) —
compared here at quantum 1, where it must equal the reference's exact
batch-max padding.
"""

from __future__ import annotations

import numpy as np
import pytest
import torch

from tests.reference_shim import load_reference_collate

from conette_tpu.data.collate import CollateDict as OurCollate


@pytest.fixture(scope="module")
def ref():
    return load_reference_collate()


def _items(seed: int, n: int, t_lens, cap_lens):
    """Parallel torch / numpy item lists with variable-length audio (T, 8)
    and captions (L,)."""
    rng = np.random.default_rng(seed)
    torch_items, np_items = [], []
    for i in range(n):
        audio = rng.standard_normal((t_lens[i], 8)).astype(np.float32)
        caps = rng.integers(4, 90, size=(cap_lens[i],)).astype(np.int64)
        torch_items.append(
            {
                "audio": torch.from_numpy(audio.copy()),
                "captions": torch.from_numpy(caps.copy()),
                "dataset": "clotho",
                "index": i,
            }
        )
        np_items.append(
            {
                "audio": audio,
                "captions": caps,
                "dataset": "clotho",
                "index": i,
            }
        )
    return torch_items, np_items


class TestAdvancedCollateParity:
    def test_padded_batch_and_shapes(self, ref):
        torch_items, np_items = _items(0, 4, [5, 3, 7, 2], [6, 4, 4, 9])
        r = ref.AdvancedCollateDict(
            pad_values={"audio": 0.0, "captions": 0}
        )(torch_items)
        o = OurCollate(pad_values={"audio": 0.0, "captions": 0})(np_items)
        np.testing.assert_array_equal(
            np.asarray(o["audio"]), r["audio"].numpy()
        )
        np.testing.assert_array_equal(
            np.asarray(o["captions"]), r["captions"].numpy()
        )
        # shape companions (reference collate.py:84-97 synthesizes them
        # from item shapes when absent)
        np.testing.assert_array_equal(
            np.asarray(o["audio_shape"]), r["audio_shape"].numpy()
        )
        np.testing.assert_array_equal(
            np.asarray(o["captions_shape"]), r["captions_shape"].numpy()
        )
        # non-tensor keys stay lists
        assert r["dataset"] == o["dataset"] == ["clotho"] * 4

    def test_nonzero_pad_value(self, ref):
        torch_items, np_items = _items(3, 3, [2, 5, 4], [3, 3, 8])
        r = ref.AdvancedCollateDict(pad_values={"captions": -1})(torch_items)
        o = OurCollate(pad_values={"captions": -1})(np_items)
        np.testing.assert_array_equal(
            np.asarray(o["captions"]), r["captions"].numpy()
        )

    def test_uniform_tensors_stack(self, ref):
        torch_items, np_items = _items(1, 3, [4, 4, 4], [5, 5, 5])
        r = ref.AdvancedCollateDict()(torch_items)
        o = OurCollate()(np_items)
        # reference stacks uniform tensors even without pad_values
        # (collate.py:99-105)
        np.testing.assert_array_equal(np.asarray(o["audio"]), r["audio"].numpy())
        np.testing.assert_array_equal(
            np.asarray(o["captions"]), r["captions"].numpy()
        )

    def test_key_intersection_order(self, ref):
        items = [
            {"a": torch.zeros(2), "b": torch.ones(2), "c": 1},
            {"a": torch.zeros(2), "c": 2},
        ]
        r = ref.AdvancedCollateDict()(items)
        # reference keeps first-item key order restricted to common keys
        # (collate.py:53-58)
        assert list(r.keys()) == ["a", "c"]

    def test_plain_collate_dict(self, ref):
        items = [
            {"x": 1, "y": "p"},
            {"x": 2, "y": "q"},
        ]
        r = ref.CollateDict()(items)
        assert r == {"x": [1, 2], "y": ["p", "q"]}

    def test_bucketing_is_superset_of_reference(self, ref):
        """With quantum 4 our caption axis rounds up to a multiple of 4;
        the reference prefix must be preserved exactly."""
        torch_items, np_items = _items(5, 3, [3, 3, 3], [5, 7, 6])
        r = ref.AdvancedCollateDict(pad_values={"captions": 0})(torch_items)
        o = OurCollate(
            pad_values={"captions": 0}, length_quantums={"captions": 4}
        )(np_items)
        assert o["captions"].shape[1] == 8  # 7 -> next multiple of 4
        np.testing.assert_array_equal(
            np.asarray(o["captions"])[:, :7], r["captions"].numpy()
        )
        assert (np.asarray(o["captions"])[:, 7:] == 0).all()
