"""Hostile/malformed container handling — every decode path must raise
ContainerError (never IndexError, struct.error, UB, or silent mis-decode).

Covers the VERDICT r1 crash class: unvalidated subframe channel bytes
(range + uniqueness), inconsistent MID/SIDE pairing (which previously
DIVERGED between the oracle and the fast path), out-of-range LPC order in
the oracle, and rice k > 31 (undefined behavior in the native bit reader).

Paths under test (SURVEY.md §4 item 2):
  1. oracle          sela_tpu.ref.codec.decode_sela
  2. fast + native   sela_tpu.codec.decoder.decode_sela (C++ scanner/unpack)
  3. fast + python   same with SELA_NO_NATIVE=1
  4. streaming       sela_tpu.codec.stream.decode_stream
"""
import numpy as np
import pytest

from sela_tpu.errors import ContainerError
from sela_tpu.format import SF_DIRECT, SF_MID, SF_SIDE
from sela_tpu.ref import codec as ref_codec
from sela_tpu.ref import container
from sela_tpu.ref.wav import WavData


@pytest.fixture(scope="module")
def stereo_wav():
    rng = np.random.default_rng(7)
    n = 900
    left = rng.integers(-3000, 3000, n).astype(np.int32)
    right = (left * 0.8 + rng.integers(-200, 200, n)).astype(np.int32)
    return WavData(44100, 16, [left, right])


@pytest.fixture(scope="module")
def stereo_buf(stereo_wav):
    return ref_codec.encode_wav(stereo_wav)


def _reserialize(buf: bytes, mutate) -> bytes:
    """Parse all frames, apply mutate(frame_idx, subframes), re-serialize."""
    h = container.parse_header(buf)
    pos = container.HEADER_SIZE
    frames = []
    for f in range(h.num_frames):
        subframes, ns, pos = container.parse_frame(buf, pos, h.channels)
        subframes = mutate(f, subframes) or subframes
        frames.append(container.serialize_frame(subframes, ns))
    return container.serialize_file(h, frames)


def _decode_all_paths(buf: bytes, monkeypatch):
    """Run every decode path; returns list of (name, callable)."""
    from sela_tpu.codec import corpus, decoder, stream

    def fast_native():
        monkeypatch.delenv("SELA_NO_NATIVE", raising=False)
        return decoder.decode_sela(buf, chunk_frames=8)

    def fast_python():
        monkeypatch.setenv("SELA_NO_NATIVE", "1")
        try:
            return decoder.decode_sela(buf, chunk_frames=8)
        finally:
            monkeypatch.delenv("SELA_NO_NATIVE", raising=False)

    def streaming():
        blocks = list(stream.decode_stream(buf, chunk_frames=8))
        return blocks

    return [
        ("oracle", lambda: ref_codec.decode_sela(buf)),
        ("fast_native", fast_native),
        ("fast_python", fast_python),
        ("stream", streaming),
        ("corpus", lambda: corpus.decode_files([buf], chunk_frames=8)),
    ]


def _assert_all_reject(buf: bytes, monkeypatch):
    for name, fn in _decode_all_paths(buf, monkeypatch):
        with pytest.raises(ContainerError):
            fn()


def test_channel_out_of_range(stereo_buf, monkeypatch):
    def mutate(f, sfs):
        sfs[0].channel = 255
        return sfs

    _assert_all_reject(_reserialize(stereo_buf, mutate), monkeypatch)


def test_duplicate_channel(stereo_buf, monkeypatch):
    def mutate(f, sfs):
        sfs[1].channel = sfs[0].channel
        return sfs

    _assert_all_reject(_reserialize(stereo_buf, mutate), monkeypatch)


def test_mid_without_side(stereo_buf, monkeypatch):
    # force (MID, DIRECT): previously the oracle decoded this as two direct
    # channels while the fast path applied inverse mid/side — a divergence
    def mutate(f, sfs):
        sfs[0].sftype = SF_MID
        sfs[1].sftype = SF_DIRECT
        return sfs

    _assert_all_reject(_reserialize(stereo_buf, mutate), monkeypatch)


def test_orphan_side(stereo_buf, monkeypatch):
    def mutate(f, sfs):
        sfs[0].sftype = SF_SIDE
        sfs[1].sftype = SF_DIRECT
        return sfs

    _assert_all_reject(_reserialize(stereo_buf, mutate), monkeypatch)


def test_bad_subframe_type(stereo_buf, monkeypatch):
    def mutate(f, sfs):
        sfs[0].sftype = 7
        return sfs

    _assert_all_reject(_reserialize(stereo_buf, mutate), monkeypatch)


def test_rice_k_out_of_range(stereo_buf, monkeypatch):
    # k > 31 must be rejected at parse time: the native BitReader's get(k)
    # is undefined behavior past 32 bits
    def mutate(f, sfs):
        sfs[0].k_res = 200
        return sfs

    _assert_all_reject(_reserialize(stereo_buf, mutate), monkeypatch)

    def mutate_kc(f, sfs):
        sfs[1].k_coeff = 32
        return sfs

    _assert_all_reject(_reserialize(stereo_buf, mutate_kc), monkeypatch)


def test_coeff_value_out_of_range(stereo_buf, monkeypatch):
    # decoded quantized reflection coefficients outside [-64, 63] must be
    # rejected (FORMAT.md §Decoder validation): beyond that range the int64
    # oracle and the limb-arithmetic fast paths would otherwise produce
    # different deterministic garbage (ADVICE r4)
    from sela_tpu.ref import rice as ref_rice

    def mutate(f, sfs):
        k_c, cw = ref_rice.encode(np.array([100], np.int32))
        sfs[0].order = 1
        sfs[0].k_coeff = k_c
        sfs[0].coeff_words = cw
        return sfs

    _assert_all_reject(_reserialize(stereo_buf, mutate), monkeypatch)

    def mutate_neg(f, sfs):
        k_c, cw = ref_rice.encode(np.array([-65], np.int32))
        sfs[1].order = 1
        sfs[1].k_coeff = k_c
        sfs[1].coeff_words = cw
        return sfs

    _assert_all_reject(_reserialize(stereo_buf, mutate_neg), monkeypatch)


def test_order_out_of_range_rejected_by_oracle(stereo_buf):
    # order > MAX_ORDER previously decoded "something" in the oracle while
    # the fast path rejected it — both must reject now
    def mutate(f, sfs):
        sfs[0].order = 200
        sfs[0].coeff_words = np.zeros(0, np.uint32)
        return sfs

    with pytest.raises(ContainerError):
        ref_codec.decode_sela(_reserialize(stereo_buf, mutate))


def test_mono_mid_rejected(monkeypatch):
    rng = np.random.default_rng(3)
    w = WavData(44100, 16, [rng.integers(-1000, 1000, 300).astype(np.int32)])
    buf = ref_codec.encode_wav(w)

    def mutate(f, sfs):
        sfs[0].sftype = SF_MID
        return sfs

    _assert_all_reject(_reserialize(buf, mutate), monkeypatch)


def test_permuted_subframe_order_accepted(stereo_buf, stereo_wav, monkeypatch):
    # reordering subframes WITHIN a frame (channel bytes intact) is a legal
    # layout — all paths must decode it identically to the original
    def mutate(f, sfs):
        return list(reversed(sfs))

    buf = _reserialize(stereo_buf, mutate)
    want = ref_codec.decode_sela(stereo_buf)
    for name, fn in _decode_all_paths(buf, monkeypatch):
        got = fn()
        if name == "stream":
            pcm = np.concatenate(got, axis=0)  # [n, C]
            chans = [pcm[:, c] for c in range(pcm.shape[1])]
        elif name == "corpus":
            chans = got[0].channels
        else:
            chans = got.channels
        for a, b in zip(chans, want.channels):
            np.testing.assert_array_equal(a, b, err_msg=name)


def test_valid_container_still_decodes_everywhere(stereo_buf, stereo_wav,
                                                  monkeypatch):
    for name, fn in _decode_all_paths(stereo_buf, monkeypatch):
        got = fn()
        if name == "stream":
            pcm = np.concatenate(got, axis=0)
            chans = [pcm[:, c] for c in range(pcm.shape[1])]
        elif name == "corpus":
            chans = got[0].channels
        else:
            chans = got.channels
        for a, b in zip(chans, stereo_wav.channels):
            np.testing.assert_array_equal(a, b, err_msg=name)
