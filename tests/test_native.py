"""Native C++ bit I/O vs numpy oracle: bit-identical packing/unpacking."""
import numpy as np
import pytest

from sela_tpu.native import bitio
from sela_tpu.ref import rice as ref_rice

pytestmark = pytest.mark.skipif(
    not bitio.available(), reason="native library not built (make -C sela_tpu/native)"
)


def _random_blocks(rng, n_blocks=50):
    blocks = []
    for i in range(n_blocks):
        n = int(rng.integers(0, 600))
        scale = [1, 5, 100, 4000, 10**6, 2**30][i % 6]
        v = rng.integers(-scale, scale + 1, n).astype(np.int32)
        u = ref_rice.zigzag(v)
        k = ref_rice.optimal_k(u) if n else 0
        blocks.append((v, int(k)))
    return blocks


def test_pack_matches_oracle(rng):
    blocks = _random_blocks(rng)
    native = bitio.pack_blocks(blocks)
    for (v, k), w_native in zip(blocks, native):
        _, w_ref = ref_rice.encode(v, k)
        np.testing.assert_array_equal(w_native, w_ref)


def test_unpack_matches_oracle(rng):
    blocks = _random_blocks(rng)
    packed = [(ref_rice.encode(v, k)[1], len(v), k) for v, k in blocks]
    native = bitio.unpack_blocks(packed)
    for (v, _), got in zip(blocks, native):
        np.testing.assert_array_equal(got, v)


def test_roundtrip_extremes():
    # note: small k on INT_MAX-scale values means ~2^32-bit unary codes —
    # legal but absurd (the optimal-k search never picks it); test the sane
    # high-k and escape paths on extremes, small k on small values elsewhere
    v = np.array([2**31 - 1, -(2**31), 0, -1, 1] * 100, dtype=np.int32)
    for k in [28, 30, 31]:
        words = bitio.pack_blocks([(v, k)])[0]
        _, w_ref = ref_rice.encode(v, k)
        np.testing.assert_array_equal(words, w_ref)
        back = bitio.unpack_blocks([(words, len(v), k)])[0]
        np.testing.assert_array_equal(back, v)


def test_forced_k0_long_unary(rng):
    # k=0 with moderately large values => long unary runs crossing words
    v = rng.integers(-200, 200, 64).astype(np.int32)
    words = bitio.pack_blocks([(v, 0)])[0]
    _, w_ref = ref_rice.encode(v, 0)
    np.testing.assert_array_equal(words, w_ref)
    np.testing.assert_array_equal(bitio.unpack_blocks([(words, 64, 0)])[0], v)


def test_empty_and_single():
    out = bitio.pack_blocks([(np.zeros(0, np.int32), 3)])
    assert len(out[0]) == 0
    one = bitio.pack_blocks([(np.array([-7], np.int32), 2)])[0]
    _, w_ref = ref_rice.encode(np.array([-7], np.int32), 2)
    np.testing.assert_array_equal(one, w_ref)


def test_bitpack_dispatcher_uses_native(rng):
    from sela_tpu.utils import bitpack

    blocks = _random_blocks(rng, 10)
    via_dispatch = bitpack.pack_blocks(blocks)
    for (v, k), w in zip(blocks, via_dispatch):
        _, w_ref = ref_rice.encode(v, k)
        np.testing.assert_array_equal(w, w_ref)


def test_native_scan_emit_roundtrip(rng, signal_factory, monkeypatch):
    """Native container scan/emit path == Python fallback, byte for byte,
    and scan(emit(x)) is the identity on the planning arrays."""
    import pytest

    from sela_tpu.codec.decoder import decode_sela
    from sela_tpu.codec.encoder import encode_wav
    from sela_tpu.native import bitio
    from sela_tpu.ref.wav import WavData

    if not bitio.available():
        pytest.skip("native library not built")

    n = 2048 * 2 + 333
    w = WavData(44100, 16, [
        signal_factory(rng, n, kind="ar"), signal_factory(rng, n, kind="noise"),
    ])
    native_buf = encode_wav(w, chunk_frames=8)
    monkeypatch.setenv("SELA_NO_NATIVE", "1")
    python_buf = encode_wav(w, chunk_frames=8)
    assert native_buf == python_buf

    out_py = decode_sela(native_buf, chunk_frames=8)
    monkeypatch.delenv("SELA_NO_NATIVE")
    out_nat = decode_sela(native_buf, chunk_frames=8)
    for a, b, c in zip(out_nat.channels, out_py.channels, w.channels):
        np.testing.assert_array_equal(a, b)
        np.testing.assert_array_equal(a, c)


def test_native_scan_rejects_garbage(rng, signal_factory):
    import pytest

    from sela_tpu.codec.decoder import decode_sela
    from sela_tpu.codec.encoder import encode_wav
    from sela_tpu.native import bitio
    from sela_tpu.ref.container import ContainerError
    from sela_tpu.ref.wav import WavData

    if not bitio.available():
        pytest.skip("native library not built")
    w = WavData(44100, 16, [signal_factory(rng, 3000, kind="ar")])
    buf = bytearray(encode_wav(w, chunk_frames=8))
    for mutate in (
        lambda b: b[: len(b) // 2],                      # truncation
        lambda b: b[:15] + b"\x00\x00\x00\x00" + b[19:],  # dead sync word
        lambda b: b + b"garbage",                         # trailing junk
    ):
        with pytest.raises(ContainerError):
            decode_sela(bytes(mutate(bytes(buf))), chunk_frames=8)
