"""Streaming decode + bounded packet queue — the playback data path.

Capability parity: upstream:src/player.cpp (C++ PortAudio player) and the C
lineage's core/packetqueue.c producer/consumer queue (sahaRatul/sela,
path-level cites — mount empty, SURVEY.md §2 "Player" / §3.3). The reference
decodes frames incrementally and hands PCM buffers to an audio callback
through a queue; here the same shape holds, TPU-style: a producer thread
decodes CHUNKS of frames (one jit dispatch per chunk keeps the device busy
and bounds latency to chunk_frames/fps), pushes PCM blocks into a bounded
PacketQueue, and any consumer (sound device callback, file writer, test)
pulls blocks in order.

decode_stream() is also the bounded-memory decode path for arbitrarily long
files: peak host memory is O(chunk) rather than O(file).
"""
from __future__ import annotations

import threading
from collections import deque
from typing import Iterator

import numpy as np

from ..format import FRAME_SIZE, MAX_ORDER
from ..ref import container
from ..ref.frame import check_coeff_range, validate_subframe_layout
from ..utils.bitpack import unpack_blocks
from .pipeline import decode_step
from ..utils.platform import backend_is_tpu as _backend_is_tpu

DEFAULT_CHUNK_FRAMES = 128  # latency/throughput tradeoff for playback


def decode_stream(buf: bytes, chunk_frames: int = DEFAULT_CHUNK_FRAMES,
                  iir: str | None = None) -> Iterator[np.ndarray]:
    """Yield PCM blocks [n, C] int32 in stream order, decoding incrementally.

    Concatenated blocks are bit-identical to decode_sela(buf).channels
    (tested). Raises ContainerError on malformed input, at the point the
    damage is reached — everything yielded before that is valid.
    """
    header = container.parse_header(buf)
    C = header.channels
    S = FRAME_SIZE
    kernel = iir
    if kernel is None:
        import jax

        if _backend_is_tpu():
            kernel = "pallas" if header.bits_per_sample <= 24 else "pallas_generic"
        else:
            kernel = "scan"

    pos = container.HEADER_SIZE
    done = 0
    while done < header.num_frames:
        n = min(chunk_frames, header.num_frames - done)
        residues = np.zeros((chunk_frames, C, S), np.int32)
        qcoeffs = np.zeros((chunk_frames, C, MAX_ORDER), np.int32)
        orders = np.zeros((chunk_frames, C), np.int32)
        sftype = np.zeros((chunk_frames, C), np.int32)
        n_valid = np.zeros(n, np.int32)
        blocks = []
        meta = []
        for f in range(n):
            subframes, ns, pos = container.parse_frame(buf, pos, C)
            validate_subframe_layout(
                [sf.channel for sf in subframes],
                [sf.sftype for sf in subframes], C,
            )
            n_valid[f] = ns
            for sf in subframes:
                blocks.append((sf.coeff_words, sf.order, sf.k_coeff))
                # partitioned residues carry their sub-ks (FORMAT.md)
                kr = sf.k_res_sub if sf.k_res_sub is not None else sf.k_res
                blocks.append((sf.res_words, sf.n_samples, kr))
                meta.append((f, sf.channel, sf.order, sf.sftype, sf.n_samples))
        values = unpack_blocks(blocks)
        for i, (fi, ch, order, t, ns) in enumerate(meta):
            if order > MAX_ORDER or ns > S:
                raise container.ContainerError("order/frame size out of range")
            check_coeff_range(values[2 * i])
            qcoeffs[fi, ch, :order] = values[2 * i]
            residues[fi, ch, :ns] = values[2 * i + 1]
            orders[fi, ch] = order
            sftype[fi, ch] = t
        x = np.asarray(decode_step(residues, qcoeffs, orders, sftype, iir=kernel))
        for f in range(n):
            yield x[f, :, : n_valid[f]].T.copy()  # [n, C]
        done += n
    if done == header.num_frames:
        container.parse_trailer(buf, pos)  # metadata passthrough; junk raises


class PacketQueue:
    """Bounded, ordered, thread-safe PCM block queue (packetqueue.c analog).

    put() blocks when full (backpressure on the decode producer), get()
    blocks until a block or end-of-stream arrives. close() signals EOS;
    abort() drains and unblocks everyone (player teardown).
    """

    def __init__(self, max_blocks: int = 32):
        self._q: deque = deque()
        self._max = max_blocks
        self._lock = threading.Lock()
        self._not_full = threading.Condition(self._lock)
        self._not_empty = threading.Condition(self._lock)
        self._closed = False
        self._aborted = False

    def put(self, block: np.ndarray) -> bool:
        with self._not_full:
            while len(self._q) >= self._max and not self._aborted:
                self._not_full.wait()
            if self._aborted:
                return False
            self._q.append(block)
            self._not_empty.notify()
            return True

    def get(self):
        """Next block, or None at end-of-stream/abort."""
        with self._not_empty:
            while not self._q and not self._closed and not self._aborted:
                self._not_empty.wait()
            if self._q and not self._aborted:
                block = self._q.popleft()
                self._not_full.notify()
                return block
            return None

    def close(self) -> None:
        with self._lock:
            self._closed = True
            self._not_empty.notify_all()

    def abort(self) -> None:
        with self._lock:
            self._aborted = True
            self._q.clear()
            self._not_empty.notify_all()
            self._not_full.notify_all()

    def __len__(self) -> int:
        with self._lock:
            return len(self._q)


class StreamingPlayer:
    """Producer thread: decode_stream -> PacketQueue. Consumer: caller.

    The reference's player couples decode to the audio callback through
    exactly this structure (upstream:src/player.cpp / core/packetqueue.c,
    path-level cites). Use: p = StreamingPlayer(buf); for block in p: ...
    """

    def __init__(self, buf: bytes, chunk_frames: int = DEFAULT_CHUNK_FRAMES,
                 max_blocks: int = 32):
        self.header = container.parse_header(buf)
        self.queue = PacketQueue(max_blocks)
        self.error: Exception | None = None
        self._thread = threading.Thread(
            target=self._produce, args=(buf, chunk_frames), daemon=True
        )
        self._thread.start()

    def _produce(self, buf: bytes, chunk_frames: int) -> None:
        try:
            for block in decode_stream(buf, chunk_frames):
                if not self.queue.put(block):
                    return  # aborted
        except Exception as e:  # surfaced to the consumer loop
            self.error = e
        finally:
            self.queue.close()

    def __iter__(self):
        while True:
            block = self.queue.get()
            if block is None:
                break
            yield block
        self._thread.join()
        if self.error is not None:
            raise self.error

    def stop(self) -> None:
        self.queue.abort()
        self._thread.join()
