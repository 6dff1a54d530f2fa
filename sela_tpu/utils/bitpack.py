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


def pack_blocks(blocks: list[tuple[np.ndarray, int]]) -> list[np.ndarray]:
    """[(int32 values, k)] -> [uint32 word arrays], one per block."""
    if _native is not None and _native.available():
        return _native.pack_blocks(blocks)
    out = []
    for values, k in blocks:
        _, words = ref_rice.encode(np.asarray(values, dtype=np.int32), k)
        out.append(words)
    return out


def unpack_blocks(blocks: list[tuple[np.ndarray, int, int]]) -> list[np.ndarray]:
    """[(uint32 words, count, k)] -> [int32 value arrays]."""
    if _native is not None and _native.available():
        return _native.unpack_blocks(blocks)
    return [
        ref_rice.decode(np.asarray(w, dtype=np.uint32), count, k)
        for w, count, k in blocks
    ]
