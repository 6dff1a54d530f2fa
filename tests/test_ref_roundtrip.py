"""Oracle end-to-end: WAV -> .sela -> WAV bit-exact; container robustness."""
import numpy as np
import pytest

from sela_tpu.ref import codec, container, frame, wav


def make_wav(rng, signal_factory, n=6000, nch=2, bps=16, rate=44100, kinds=None):
    kinds = kinds or ["ar"] * nch
    amp = 2 ** (bps - 1) - 2
    chans = [signal_factory(rng, n, amp=min(amp, 20000), kind=k) for k in kinds]
    return wav.WavData(rate, bps, chans)


def test_mid_side_inverse_exhaustive_small():
    vals = np.arange(-17, 17, dtype=np.int32)
    L, R = np.meshgrid(vals, vals)
    m, s = frame.mid_side(L.ravel(), R.ravel())
    l2, r2 = frame.inverse_mid_side(m, s)
    np.testing.assert_array_equal(l2, L.ravel())
    np.testing.assert_array_equal(r2, R.ravel())


def test_mid_side_inverse_extremes(rng):
    L = rng.integers(-(2**23), 2**23, 1000).astype(np.int32)
    R = rng.integers(-(2**23), 2**23, 1000).astype(np.int32)
    m, s = frame.mid_side(L, R)
    l2, r2 = frame.inverse_mid_side(m, s)
    np.testing.assert_array_equal(l2, L)
    np.testing.assert_array_equal(r2, R)


@pytest.mark.parametrize(
    "nch,kinds",
    [(1, ["ar"]), (2, ["ar", "ar"]), (2, ["tone", "noise"]), (3, ["ar", "ar", "tone"])],
)
def test_roundtrip_channels(rng, signal_factory, nch, kinds):
    w = make_wav(rng, signal_factory, n=5000, nch=nch, kinds=kinds)
    buf = codec.encode_wav(w)
    out = codec.decode_sela(buf)
    assert out.sample_rate == w.sample_rate
    assert out.bits_per_sample == w.bits_per_sample
    for a, b in zip(out.channels, w.channels):
        np.testing.assert_array_equal(a, b)


def test_roundtrip_tail_frame(rng, signal_factory):
    # 2048*2 + 123 -> final frame is short
    w = make_wav(rng, signal_factory, n=2048 * 2 + 123)
    out = codec.decode_sela(codec.encode_wav(w))
    for a, b in zip(out.channels, w.channels):
        np.testing.assert_array_equal(a, b)


def test_roundtrip_tiny(rng, signal_factory):
    w = make_wav(rng, signal_factory, n=3, nch=1)
    out = codec.decode_sela(codec.encode_wav(w))
    np.testing.assert_array_equal(out.channels[0], w.channels[0])


def test_roundtrip_24bit(rng, signal_factory):
    w = make_wav(rng, signal_factory, n=4000, bps=24, rate=96000)
    w.channels[0] = (w.channels[0].astype(np.int64) * 200).clip(-(2**23), 2**23 - 1).astype(np.int32)
    out = codec.decode_sela(codec.encode_wav(w))
    for a, b in zip(out.channels, w.channels):
        np.testing.assert_array_equal(a, b)


def test_compresses_ar_audio(rng, signal_factory):
    w = make_wav(rng, signal_factory, n=44100)
    buf = codec.encode_wav(w)
    raw = w.n_samples * w.n_channels * 2
    assert len(buf) < 0.75 * raw  # predictable audio must compress


def test_ms_decorrelation_chosen_for_correlated(rng, signal_factory):
    x = signal_factory(rng, 4096, kind="ar")
    near = x + rng.integers(-2, 3, 4096).astype(np.int32)
    w = wav.WavData(44100, 16, [x, near])
    buf = codec.encode_wav(w)
    subframes, _, _ = container.parse_frame(buf, container.HEADER_SIZE, 2)
    assert subframes[0].sftype == 1 and subframes[1].sftype == 2
    out = codec.decode_sela(buf)
    np.testing.assert_array_equal(out.channels[0], x)
    np.testing.assert_array_equal(out.channels[1], near)


def test_wav_io_roundtrip(tmp_path, rng, signal_factory):
    for bps in (8, 16, 24, 32):
        amp = 2 ** (bps - 1) - 2
        chans = [
            rng.integers(-amp, amp, 777).astype(np.int32),
            rng.integers(-amp, amp, 777).astype(np.int32),
        ]
        w = wav.WavData(48000, bps, chans)
        p = str(tmp_path / f"t{bps}.wav")
        wav.write_wav(p, w)
        r = wav.read_wav(p)
        assert r.sample_rate == 48000 and r.bits_per_sample == bps
        for a, b in zip(r.channels, chans):
            np.testing.assert_array_equal(a, b)


def test_container_corruption_errors(rng, signal_factory):
    w = make_wav(rng, signal_factory, n=3000)
    buf = bytearray(codec.encode_wav(w))
    with pytest.raises(container.ContainerError):
        codec.decode_sela(bytes(buf[:10]))  # truncated
    bad = bytes(b"XXXX") + bytes(buf[4:])
    with pytest.raises(container.ContainerError):
        codec.decode_sela(bad)  # bad magic
    buf2 = bytearray(buf)
    buf2[container.HEADER_SIZE] ^= 0xFF  # clobber first frame sync
    with pytest.raises(container.ContainerError):
        codec.decode_sela(bytes(buf2))
