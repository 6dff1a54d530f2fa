"""Host bitstream packing/unpacking for Rice blocks.

Dispatches to the native C++ fast path (sela_tpu.native) when the shared
library is built, else falls back to the vectorized numpy oracle coder.
The outputs are bit-identical either way (asserted in tests).
"""
from __future__ import annotations

import numpy as np

from ..ref import rice as ref_rice

try:  # native fast path, built via `make -C sela_tpu/native`
    from ..native import bitio as _native
except Exception:  # pragma: no cover - absent until built
    _native = None


def _is_sub_ks(k) -> bool:
    return isinstance(k, (list, tuple)) or np.ndim(k) > 0


def pack_blocks(blocks: list[tuple[np.ndarray, object]]) -> list[np.ndarray]:
    """[(int32 values, k)] -> [uint32 word arrays], one per block.

    k may be an int (plain block) or a sequence of sub-block ks
    (partitioned residues, FORMAT.md §Partitioned residues)."""
    if _native is not None and _native.available():
        return _native.pack_blocks(blocks)
    out = []
    for values, k in blocks:
        v = np.asarray(values, dtype=np.int32)
        if _is_sub_ks(k):
            out.append(ref_rice.encode_with_sub_ks(v, list(k)))
        else:
            _, words = ref_rice.encode(v, k)
            out.append(words)
    return out


def unpack_blocks(blocks: list[tuple[np.ndarray, int, object]]) -> list[np.ndarray]:
    """[(uint32 words, count, k)] -> [int32 value arrays]."""
    if _native is not None and _native.available():
        return _native.unpack_blocks(blocks)
    out = []
    for w, count, k in blocks:
        w = np.asarray(w, dtype=np.uint32)
        if _is_sub_ks(k):
            out.append(ref_rice.decode_partitioned(w, count, list(k)))
        else:
            out.append(ref_rice.decode(w, count, k))
    return out
