"""Partitioned residues (FORMAT.md §Partitioned residues) — profile v2.

Covers: oracle + JAX encoders with residue_partition=4, all four decode
paths on partitioned streams, the never-grows guarantee, the >=1% ratio win
on transient content (the adoption gate from VERDICT r1 item 9), v1 stream
frozenness under the default profile, and hostile sub-k bytes.
"""
import numpy as np
import pytest

from sela_tpu.config import BitstreamProfile
from sela_tpu.errors import ContainerError
from sela_tpu.format import RICE_PARTITION_MARKER
from sela_tpu.ref import codec as ref_codec
from sela_tpu.ref import container, rice
from sela_tpu.ref.wav import WavData

V2 = BitstreamProfile(residue_partition=4)


def percussive_wav(seconds=1.5, seed=0):
    rng = np.random.default_rng(seed)
    n = int(44100 * seconds)
    t = np.arange(n) / 44100
    env = np.zeros(n)
    period = int(0.12 * 44100)
    for s in range(0, n, period):
        L = min(period, n - s)
        env[s : s + L] = np.exp(-np.arange(L) / (0.015 * 44100))
    sig = env * (np.sin(2 * np.pi * 180 * t) + 0.5 * np.sin(2 * np.pi * 923 * t))
    sig = sig * 24000 + rng.normal(0, 120, n) * (0.15 + env)
    left = np.clip(np.round(sig), -32767, 32767).astype(np.int32)
    right = np.clip(np.round(np.roll(sig, 31) * 0.94), -32767, 32767).astype(np.int32)
    return WavData(44100, 16, [left, right])


# ------------------------------------------------------------- rice layer --

def test_partitioned_rice_roundtrip_random():
    rng = np.random.default_rng(1)
    for n in (0, 1, 3, 4, 5, 17, 512, 2048):
        for sb in (2, 14, 29):
            v = (rng.integers(-(1 << sb), 1 << sb, n).astype(np.int32)
                 if n else np.zeros(0, np.int32))
            ks, w = rice.encode_partitioned(v)
            np.testing.assert_array_equal(rice.decode_partitioned(w, n, ks), v)


def test_partitioned_rice_mixed_magnitudes_and_escape():
    rng = np.random.default_rng(2)
    v = np.concatenate([
        rng.integers(-3, 3, 512), rng.integers(-(1 << 30), 1 << 30, 512),
        np.zeros(512, int), np.full(512, -(1 << 31)),
    ]).astype(np.int32)
    ks, w = rice.encode_partitioned(v)
    assert len(set(ks)) > 1  # actually adapted
    np.testing.assert_array_equal(rice.decode_partitioned(w, len(v), ks), v)
    # given-ks packing (device-planned path) produces the same bytes
    w2 = rice.encode_with_sub_ks(v, ks)
    np.testing.assert_array_equal(w2, w)


# ------------------------------------------------------------ oracle codec --

def test_oracle_v2_roundtrip_and_smaller():
    w = percussive_wav()
    v1 = ref_codec.encode_wav(w)
    v2 = ref_codec.encode_wav(w, profile=V2)
    assert len(v2) < len(v1) * 0.99  # >=1% win on transient content
    out = ref_codec.decode_sela(v2)
    for a, b in zip(out.channels, w.channels):
        np.testing.assert_array_equal(a, b)


def test_v2_never_grows_on_stationary():
    rng = np.random.default_rng(3)
    n = 6000
    tone = np.round(20000 * 0.7 * np.sin(np.arange(n) * 0.07)).astype(np.int32)
    noise = rng.integers(-500, 500, n).astype(np.int32)
    w = WavData(44100, 16, [tone + noise])
    v1 = ref_codec.encode_wav(w)
    v2 = ref_codec.encode_wav(w, profile=V2)
    assert len(v2) <= len(v1)  # adaptive: falls back per subframe
    out = ref_codec.decode_sela(v2)
    np.testing.assert_array_equal(out.channels[0], w.channels[0])


def test_default_profile_never_emits_marker():
    w = percussive_wav(0.8)
    buf = ref_codec.encode_wav(w)  # v1 defaults
    h = container.parse_header(buf)
    pos = container.HEADER_SIZE
    for _ in range(h.num_frames):
        sfs, _, pos = container.parse_frame(buf, pos, h.channels)
        for sf in sfs:
            assert sf.k_res != RICE_PARTITION_MARKER


# ----------------------------------------------------------- fast pipeline --

def test_jax_v2_roundtrip_all_paths(monkeypatch):
    from sela_tpu.codec.decoder import decode_sela
    from sela_tpu.codec.encoder import encode_wav
    from sela_tpu.codec.stream import decode_stream

    w = percussive_wav(1.0, seed=5)
    v1 = encode_wav(w, chunk_frames=8)
    v2 = encode_wav(w, chunk_frames=8, profile=V2)
    assert len(v2) < len(v1)

    # contains at least one partitioned subframe
    h = container.parse_header(v2)
    pos = container.HEADER_SIZE
    seen = 0
    for _ in range(h.num_frames):
        sfs, _, pos = container.parse_frame(v2, pos, h.channels)
        seen += sum(sf.k_res == RICE_PARTITION_MARKER for sf in sfs)
    assert seen > 0

    def check(chans):
        for a, b in zip(chans, w.channels):
            np.testing.assert_array_equal(a, b)

    check(decode_sela(v2, chunk_frames=8).channels)  # fast, native
    monkeypatch.setenv("SELA_NO_NATIVE", "1")
    check(decode_sela(v2, chunk_frames=8).channels)  # fast, python
    monkeypatch.delenv("SELA_NO_NATIVE")
    check(ref_codec.decode_sela(v2).channels)        # oracle
    blocks = list(decode_stream(v2, chunk_frames=8))  # streaming
    pcm = np.concatenate(blocks, axis=0)
    check([pcm[:, c] for c in range(pcm.shape[1])])


def test_jax_v2_native_and_python_packers_agree(monkeypatch):
    from sela_tpu.codec.encoder import encode_wav

    w = percussive_wav(0.6, seed=6)
    a = encode_wav(w, chunk_frames=8, profile=V2)
    monkeypatch.setenv("SELA_NO_NATIVE", "1")
    b = encode_wav(w, chunk_frames=8, profile=V2)
    assert a == b


# ----------------------------------------------------------------- hostile --

def test_hostile_sub_k_rejected():
    w = percussive_wav(0.6, seed=7)
    buf = bytearray(ref_codec.encode_wav(w, profile=V2))
    # find the first partitioned subframe and corrupt one sub-k byte
    h = container.parse_header(bytes(buf))
    pos = container.HEADER_SIZE
    target = None
    for _ in range(h.num_frames):
        frame_pos = pos
        sfs, ns, pos = container.parse_frame(bytes(buf), frame_pos, h.channels)
        p = frame_pos + 6
        for sf in sfs:
            # walk to this subframe's kRes byte
            kres_off = p + 6 + 4 * len(sf.coeff_words)
            if sf.k_res == RICE_PARTITION_MARKER:
                target = kres_off + 1  # first sub-k byte
                break
            p = kres_off + 5 + 4 * len(sf.res_words)
        if target is not None:
            break
    assert target is not None
    buf[target] = 200
    with pytest.raises(ContainerError):
        ref_codec.decode_sela(bytes(buf))
    from sela_tpu.codec.decoder import decode_sela

    with pytest.raises(ContainerError):
        decode_sela(bytes(buf), chunk_frames=8)


def test_profile_validation():
    with pytest.raises(ValueError):
        BitstreamProfile(residue_partition=3).validate()
    BitstreamProfile(residue_partition=4).validate()
    BitstreamProfile(residue_partition=1).validate()
