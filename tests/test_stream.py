"""Streaming decode + packet queue (player data path)."""
import threading
import time

import numpy as np
import pytest

from sela_tpu.codec.encoder import encode_wav
from sela_tpu.codec.stream import PacketQueue, StreamingPlayer, decode_stream
from sela_tpu.ref import container
from sela_tpu.ref.wav import WavData


def make_wav(rng, signal_factory, n=2048 * 3 + 300):
    return WavData(
        44100, 16,
        [signal_factory(rng, n, kind="ar"), signal_factory(rng, n, kind="tone")],
    )


def test_decode_stream_matches_full_decode(rng, signal_factory):
    w = make_wav(rng, signal_factory)
    buf = encode_wav(w, chunk_frames=8)
    blocks = list(decode_stream(buf, chunk_frames=2))
    assert len(blocks) == 4  # one yield per frame
    pcm = np.concatenate(blocks, axis=0)
    assert pcm.shape == (w.n_samples, 2)
    for c in range(2):
        np.testing.assert_array_equal(pcm[:, c], w.channels[c])


def test_decode_stream_raises_midstream_on_corruption(rng, signal_factory):
    w = make_wav(rng, signal_factory)
    buf = bytearray(encode_wav(w, chunk_frames=8))
    # corrupt the LAST frame's sync word: earlier frames must still stream
    pos = container.HEADER_SIZE
    for _ in range(3):
        _, _, pos = container.parse_frame(bytes(buf), pos, 2)
    buf[pos] ^= 0xFF
    got = []
    with pytest.raises(container.ContainerError):
        for block in decode_stream(bytes(buf), chunk_frames=1):
            got.append(block)
    assert len(got) == 3
    for c in range(2):
        np.testing.assert_array_equal(
            np.concatenate([b[:, c] for b in got]), w.channels[c][: 3 * 2048]
        )


def test_packet_queue_bounded_and_ordered():
    q = PacketQueue(max_blocks=2)
    got = []

    def consumer():
        while True:
            b = q.get()
            if b is None:
                return
            got.append(b)
            time.sleep(0.001)

    t = threading.Thread(target=consumer)
    t.start()
    blocks = [np.full((4, 2), i, np.int32) for i in range(16)]
    for b in blocks:
        assert q.put(b)
        assert len(q) <= 2  # bounded
    q.close()
    t.join()
    assert [int(b[0, 0]) for b in got] == list(range(16))


def test_packet_queue_abort_unblocks_producer():
    q = PacketQueue(max_blocks=1)
    q.put(np.zeros((1, 1), np.int32))
    done = []

    def producer():
        done.append(q.put(np.ones((1, 1), np.int32)))  # blocks until abort

    t = threading.Thread(target=producer)
    t.start()
    time.sleep(0.05)
    q.abort()
    t.join(timeout=5)
    assert not t.is_alive()
    assert done == [False]
    assert q.get() is None


def test_streaming_player_end_to_end(rng, signal_factory):
    w = make_wav(rng, signal_factory, n=2048 * 2 + 10)
    buf = encode_wav(w, chunk_frames=8)
    player = StreamingPlayer(buf, chunk_frames=1, max_blocks=2)
    pcm = np.concatenate(list(player), axis=0)
    for c in range(2):
        np.testing.assert_array_equal(pcm[:, c], w.channels[c])


def test_streaming_player_surfaces_errors(rng, signal_factory):
    w = make_wav(rng, signal_factory, n=2048)
    buf = encode_wav(w, chunk_frames=8)
    player = StreamingPlayer(buf[:-3], chunk_frames=1)
    with pytest.raises(container.ContainerError):
        list(player)
