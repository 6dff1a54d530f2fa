"""Corpus batch codec: heterogeneous file batches, shared device chunks."""
import numpy as np

from sela_tpu.codec import corpus
from sela_tpu.ref import codec as ref_codec
from sela_tpu.ref.wav import WavData

CHUNK = 8


def _mixed_corpus(rng, signal_factory, n_files=12):
    wavs = []
    for i in range(n_files):
        nch = [1, 2, 2, 3][i % 4]
        bps = [16, 16, 24, 16][i % 4]
        n = int(rng.integers(500, 5000))
        kinds = ["ar", "tone", "noise"]
        chans = [
            signal_factory(rng, n, amp=2 ** (min(bps, 16) - 1) - 2, kind=kinds[c % 3])
            for c in range(nch)
        ]
        rate = [44100, 48000, 96000][i % 3]
        wavs.append(WavData(rate, bps, chans))
    return wavs


def test_encode_files_roundtrip(rng, signal_factory):
    wavs = _mixed_corpus(rng, signal_factory)
    bufs = corpus.encode_files(wavs, chunk_frames=CHUNK)
    outs = corpus.decode_files(bufs, chunk_frames=CHUNK)
    for w, o in zip(wavs, outs):
        assert o.sample_rate == w.sample_rate
        assert o.bits_per_sample == w.bits_per_sample
        for a, b in zip(o.channels, w.channels):
            np.testing.assert_array_equal(a, b)


def test_batch_matches_single_file_containers(rng, signal_factory):
    """Batch-encoded containers decode identically via the oracle decoder."""
    wavs = _mixed_corpus(rng, signal_factory, n_files=6)
    bufs = corpus.encode_files(wavs, chunk_frames=CHUNK)
    for w, buf in zip(wavs, bufs):
        o = ref_codec.decode_sela(buf)
        for a, b in zip(o.channels, w.channels):
            np.testing.assert_array_equal(a, b)


def test_batch_byte_equals_per_file_jax_encode(rng, signal_factory):
    """Grouped batching must not change the emitted bytes vs per-file encode."""
    from sela_tpu.codec.encoder import encode_wav

    wavs = [w for w in _mixed_corpus(rng, signal_factory, n_files=4)]
    bufs = corpus.encode_files(wavs, chunk_frames=CHUNK)
    for w, buf in zip(wavs, bufs):
        single = encode_wav(w, chunk_frames=CHUNK)
        assert single == buf
