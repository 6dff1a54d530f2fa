"""Metadata tags trailer: roundtrip, passthrough, editing, fuzz."""
import numpy as np
import pytest

from sela_tpu.codec.decoder import decode_sela
from sela_tpu.codec.encoder import encode_wav
from sela_tpu.ref import codec as ref_codec
from sela_tpu.ref import container
from sela_tpu.ref.wav import WavData

TAGS = {"title": "Sine Étude", "artist": "sela-tpu", "raw": b"\x00\xff\x01"}


def make_wav(rng, signal_factory, n=2048 + 99):
    return WavData(
        44100, 16,
        [signal_factory(rng, n, kind="ar"), signal_factory(rng, n, kind="tone")],
    )


def test_tags_roundtrip_both_engines(rng, signal_factory):
    w = make_wav(rng, signal_factory)
    for buf in (
        encode_wav(w, chunk_frames=8, tags=TAGS),
        ref_codec.encode_wav(w, tags=TAGS),
    ):
        got = container.read_tags(buf)
        assert got["title"] == "Sine Étude"
        assert got["artist"] == "sela-tpu"
        assert got["raw"] == b"\x00\xff\x01"
        # both decoders pass tags through untouched
        for dec in (decode_sela, ref_codec.decode_sela):
            out = dec(buf)
            for a, b in zip(out.channels, w.channels):
                np.testing.assert_array_equal(a, b)


def test_tags_do_not_change_audio_payload(rng, signal_factory):
    w = make_wav(rng, signal_factory)
    plain = encode_wav(w, chunk_frames=8)
    tagged = encode_wav(w, chunk_frames=8, tags={"k": "v"})
    assert tagged[: len(plain)] == plain
    assert container.read_tags(plain) == {}


def test_replace_tags_is_lossless(rng, signal_factory):
    w = make_wav(rng, signal_factory)
    buf = encode_wav(w, chunk_frames=8, tags={"a": "1"})
    buf2 = container.replace_tags(buf, {"b": "2", "c": "3"})
    assert container.read_tags(buf2) == {"b": "2", "c": "3"}
    buf3 = container.replace_tags(buf2, None)
    assert buf3 == encode_wav(w, chunk_frames=8)
    out = ref_codec.decode_sela(buf2)
    for a, b in zip(out.channels, w.channels):
        np.testing.assert_array_equal(a, b)


def test_streaming_decode_accepts_tags(rng, signal_factory):
    from sela_tpu.codec.stream import decode_stream

    w = make_wav(rng, signal_factory)
    buf = encode_wav(w, chunk_frames=8, tags=TAGS)
    pcm = np.concatenate(list(decode_stream(buf, chunk_frames=2)), axis=0)
    for c in range(2):
        np.testing.assert_array_equal(pcm[:, c], w.channels[c])


def test_malformed_trailers_rejected(rng, signal_factory):
    w = make_wav(rng, signal_factory)
    buf = encode_wav(w, chunk_frames=8)
    tagged = encode_wav(w, chunk_frames=8, tags={"k": "v"})
    cases = [
        buf + b"junk",                       # not a tags block
        tagged[:-2],                         # truncated tags payload
        tagged + b"x",                       # junk after tags
        buf + b"SeTg\xff\xff\xff\xff",       # absurd payload length
    ]
    for bad in cases:
        with pytest.raises(container.ContainerError):
            ref_codec.decode_sela(bad)
        with pytest.raises(container.ContainerError):
            decode_sela(bad)


def test_apev2_roundtrip_and_decode(rng, signal_factory):
    """Real APEv2 wire format (FORMAT.md §Tags, C-lineage core/apev2.c
    parity): write, auto-detected read, decode passthrough."""
    w = make_wav(rng, signal_factory)
    buf = encode_wav(w, chunk_frames=8)
    ape_tags = {"Title": "Sine Étude", "Artist": "sela-tpu",
                "Cover Art (Front)": b"\x89PNG\x00\xff"}
    buf2 = container.replace_tags(buf, ape_tags, fmt="apev2")
    assert container.read_tags(buf2) == ape_tags
    for dec in (decode_sela, ref_codec.decode_sela):
        out = dec(buf2)
        for a, b in zip(out.channels, w.channels):
            np.testing.assert_array_equal(a, b)
    # structure is genuine APEv2: header+footer preambles, v2000, sizes
    import struct

    end = container.frames_end(buf2)
    assert buf2[end : end + 8] == b"APETAGEX"
    assert buf2[-32:-24] == b"APETAGEX"
    version, size, count, flags = struct.unpack_from("<IIII", buf2, len(buf2) - 24)
    assert version == 2000 and count == 3
    assert len(buf2) - end == size + 32  # header + (items + footer)
    # format conversion both ways preserves content
    buf3 = container.replace_tags(buf2, container.read_tags(buf2), fmt="setg")
    assert container.read_tags(buf3) == ape_tags
    # streaming decode passes an APEv2 trailer through untouched
    from sela_tpu.codec.stream import decode_stream

    pcm = np.concatenate(list(decode_stream(buf2, chunk_frames=2)), axis=0)
    for c in range(2):
        np.testing.assert_array_equal(pcm[:, c], w.channels[c])


def test_apev2_footer_only_interop(rng, signal_factory):
    """Footer-only APEv2 blocks (other writers omit the header) parse too."""
    w = make_wav(rng, signal_factory)
    buf = encode_wav(w, chunk_frames=8)
    full = container.serialize_tags_apev2({"k": "v"})
    header, rest = full[:32], full[32:]
    # strip the header and clear the footer's HAS_HEADER flag
    import struct

    footer = bytearray(rest[-32:])
    version, size, count, flags = struct.unpack_from("<IIII", bytes(footer), 8)
    struct.pack_into("<IIII", footer, 8, version, size, count,
                     flags & ~container.APE_FLAG_HAS_HEADER)
    buf2 = buf + rest[:-32] + bytes(footer)
    assert container.read_tags(buf2) == {"k": "v"}
    out = ref_codec.decode_sela(buf2)
    for a, b in zip(out.channels, w.channels):
        np.testing.assert_array_equal(a, b)


def test_apev2_malformed_rejected(rng, signal_factory):
    w = make_wav(rng, signal_factory)
    buf = encode_wav(w, chunk_frames=8)
    good = buf + container.serialize_tags_apev2({"k": "v"})
    cases = [
        good[:-1],                       # truncated footer
        good + b"x",                     # junk after footer
        good[: len(buf)] + good[len(buf) + 1 :],  # header misaligned
    ]
    # corrupt version
    bad_ver = bytearray(good)
    bad_ver[-24] ^= 1
    cases.append(bytes(bad_ver))
    for bad in cases:
        with pytest.raises(container.ContainerError):
            ref_codec.decode_sela(bad)
        with pytest.raises(container.ContainerError):
            decode_sela(bad)
    with pytest.raises(container.ContainerError):
        container.serialize_tags_apev2({"bad\x00key": "v"})
    with pytest.raises(container.ContainerError):
        container.serialize_tags_apev2({"é": "v"})


def test_cli_tag_subcommand(tmp_path, rng, signal_factory):
    from sela_tpu import cli
    from sela_tpu.ref.wav import write_wav

    w = make_wav(rng, signal_factory)
    wav = str(tmp_path / "in.wav")
    sela = str(tmp_path / "a.sela")
    write_wav(wav, w)
    assert cli.main(["encode", wav, sela, "--chunk-frames", "8",
                     "--tag", "title=T1"]) == 0
    assert container.read_tags(open(sela, "rb").read()) == {"title": "T1"}
    assert cli.main(["tag", sela, "--set", "artist=A"]) == 0
    assert container.read_tags(open(sela, "rb").read()) == {
        "title": "T1", "artist": "A"}
    assert cli.main(["tag", sela, "--clear", "--set", "only=x"]) == 0
    assert container.read_tags(open(sela, "rb").read()) == {"only": "x"}
    assert cli.main(["tag", sela]) == 0
    assert cli.main(["info", sela]) == 0
