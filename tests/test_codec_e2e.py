"""End-to-end JAX codec: encode/decode via the jit pipeline, cross-checked
against the numpy oracle (roundtrip-exact in all four engine pairings)."""
import numpy as np
import pytest

from sela_tpu.codec import decoder as jdec
from sela_tpu.codec import encoder as jenc
from sela_tpu.ref import codec as ref_codec
from sela_tpu.ref.wav import WavData

CHUNK = 8  # small fixed chunk => one jit compile for the whole suite


def make_wav(rng, signal_factory, n=2048 * 3 + 123, nch=2, bps=16, kinds=None):
    kinds = kinds or ["ar"] * nch
    chans = [signal_factory(rng, n, kind=k) for k in kinds]
    return WavData(44100, bps, chans)


def test_jax_roundtrip_stereo(rng, signal_factory):
    w = make_wav(rng, signal_factory)
    buf = jenc.encode_wav(w, chunk_frames=CHUNK)
    out = jdec.decode_sela(buf, chunk_frames=CHUNK)
    for a, b in zip(out.channels, w.channels):
        np.testing.assert_array_equal(a, b)


def test_jax_encode_oracle_decode(rng, signal_factory):
    w = make_wav(rng, signal_factory, kinds=["ar", "tone"])
    buf = jenc.encode_wav(w, chunk_frames=CHUNK)
    out = ref_codec.decode_sela(buf)
    for a, b in zip(out.channels, w.channels):
        np.testing.assert_array_equal(a, b)


def test_oracle_encode_jax_decode(rng, signal_factory):
    w = make_wav(rng, signal_factory, kinds=["noise", "ar"])
    buf = ref_codec.encode_wav(w)
    out = jdec.decode_sela(buf, chunk_frames=CHUNK)
    for a, b in zip(out.channels, w.channels):
        np.testing.assert_array_equal(a, b)


def test_jax_roundtrip_mono_and_3ch(rng, signal_factory):
    for nch, kinds in [(1, ["ar"]), (3, ["ar", "ar", "tone"])]:
        w = make_wav(rng, signal_factory, n=2048 + 77, nch=nch, kinds=kinds)
        buf = jenc.encode_wav(w, chunk_frames=CHUNK)
        out = jdec.decode_sela(buf, chunk_frames=CHUNK)
        for a, b in zip(out.channels, w.channels):
            np.testing.assert_array_equal(a, b)


def test_jax_compression_comparable_to_oracle(rng, signal_factory):
    w = make_wav(rng, signal_factory, n=2048 * 4)
    jbuf = jenc.encode_wav(w, chunk_frames=CHUNK)
    rbuf = ref_codec.encode_wav(w)
    # float analysis differs (f32 vs f64) but plans should be near-identical
    assert abs(len(jbuf) - len(rbuf)) / len(rbuf) < 0.02


def test_jax_24bit_hires(rng, signal_factory):
    w = make_wav(rng, signal_factory, n=2048 * 2, bps=24)
    w.channels[0] = (
        (w.channels[0].astype(np.int64) * 200).clip(-(2**23), 2**23 - 1).astype(np.int32)
    )
    buf = jenc.encode_wav(w, chunk_frames=CHUNK)
    out = jdec.decode_sela(buf, chunk_frames=CHUNK)
    for a, b in zip(out.channels, w.channels):
        np.testing.assert_array_equal(a, b)


def test_jax_32bit_int32_min_roundtrip(rng, signal_factory):
    """ADVICE r2 (high): abs-based fits16 wrapped at INT32_MIN, flagging a
    32-bit frame with one -2^31 sample as int16-safe — the int16 wire then
    truncated it to 0 (silent loss in a lossless codec). The wrap-safe range
    check must send such frames down the exact int32 wire."""
    n = 2048 + 300
    chan = np.zeros(n, np.int32)  # residues tiny everywhere except the spike
    chan[100] = -(1 << 31)
    w = WavData(44100, 32, [chan])
    buf = jenc.encode_wav(w, chunk_frames=CHUNK)
    out = jdec.decode_sela(buf, chunk_frames=CHUNK)
    np.testing.assert_array_equal(out.channels[0], chan)
    assert out.channels[0][100] == -(1 << 31)

    from sela_tpu.codec import corpus

    bufs = corpus.encode_files([w], chunk_frames=CHUNK)
    outs = corpus.decode_files(bufs, chunk_frames=CHUNK)
    np.testing.assert_array_equal(outs[0].channels[0], chan)


def test_wire_dtype_parity(rng, signal_factory):
    """int16 H2D/D2H wire format (bps<=16) produces identical bytes and PCM
    to the int32 path (24-bit input drives the int32 wire)."""
    import numpy as np

    from sela_tpu.codec.decoder import decode_sela as jdec
    from sela_tpu.codec.encoder import encode_wav as jenc
    from sela_tpu.codec.pipeline import encode_step
    from sela_tpu.ref.wav import WavData

    n = 2048 + 70
    w16 = WavData(44100, 16, [signal_factory(rng, n, kind="ar")])
    buf16 = jenc(w16, chunk_frames=8)  # int16 wire
    # same PCM through the int32 wire must give identical bytes
    x = np.zeros((8, 1, 2048), np.int32)
    x[0, 0, :] = w16.channels[0][:2048]
    x[1, 0, : n - 2048] = w16.channels[0][2048:]
    out16 = {k: np.asarray(v) for k, v in encode_step(
        x.astype(np.int16), np.array([2048, n - 2048] + [0] * 6, np.int32)
    ).items()}
    out32 = {k: np.asarray(v) for k, v in encode_step(
        x, np.array([2048, n - 2048] + [0] * 6, np.int32)).items()}
    for key in out32:
        np.testing.assert_array_equal(out16[key], out32[key], err_msg=key)
    got = jdec(buf16, chunk_frames=8)  # int16 D2H wire
    np.testing.assert_array_equal(got.channels[0], w16.channels[0])

    w24 = WavData(96000, 24, [signal_factory(rng, n, amp=2**22, kind="noise")])
    buf24 = jenc(w24, chunk_frames=8)
    got24 = jdec(buf24, chunk_frames=8)
    np.testing.assert_array_equal(got24.channels[0], w24.channels[0])
