"""Deterministic checksums of arbitrary values / parameter pytrees.

Twin of the reference's reproducibility self-checks
(``src/conette/utils/csum.py:33-90``, logged at stage boundaries by
``callbacks/debug.py:47-59`` and ``predict.py:203-207``): a stable integer
digest of nested values and model parameters, used to assert that two runs
or two hosts hold identical state.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Any, Mapping

import numpy as np


def _update(h: "hashlib._Hash", value: Any) -> None:
    if value is None:
        h.update(b"\x00none")
    elif isinstance(value, (bool, int)):
        h.update(b"\x01int" + struct.pack("<q", int(value)))
    elif isinstance(value, float):
        h.update(b"\x02flt" + struct.pack("<d", value))
    elif isinstance(value, str):
        h.update(b"\x03str" + value.encode())
    elif isinstance(value, bytes):
        h.update(b"\x04byt" + value)
    elif isinstance(value, Mapping):
        h.update(b"\x05map")
        for k in sorted(value.keys(), key=str):
            _update(h, str(k))
            _update(h, value[k])
    elif isinstance(value, (list, tuple)):
        h.update(b"\x06seq" + struct.pack("<q", len(value)))
        for v in value:
            _update(h, v)
    elif hasattr(value, "shape"):  # ndarray / jax array
        arr = np.asarray(value)
        h.update(b"\x07arr" + str(arr.dtype).encode() + str(arr.shape).encode())
        h.update(np.ascontiguousarray(arr).tobytes())
    else:
        h.update(b"\x08obj" + repr(value).encode())


def csum_any(value: Any) -> int:
    """Stable integer checksum of a nested value."""
    h = hashlib.blake2b(digest_size=8)
    _update(h, value)
    return int.from_bytes(h.digest(), "little")


def csum_module(params: Any, with_names: bool = True) -> int:
    """Checksum of a parameter pytree (reference ``csum_module`` twin)."""
    import jax

    if with_names:
        leaves = jax.tree_util.tree_leaves_with_path(params)
        return csum_any([(jax.tree_util.keystr(p), v) for p, v in leaves])
    return csum_any(jax.tree_util.tree_leaves(params))
