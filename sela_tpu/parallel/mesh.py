"""Mesh construction + pjit sharding for the frame-parallel codec.

The reference's only concurrency is frame-level std::thread fork/join inside
one process (upstream:src/encoder.cpp — SURVEY.md SS2 "Thread concurrency",
path-level cite, mount empty). The TPU-native equivalent: audio frames are a
data-parallel axis sharded over a 1-D `('data',)` jax.sharding.Mesh spanning
all chips (ICI within a slice, DCN across hosts); codec parameters are
replicated; per-frame planning outputs come back sharded the same way and are
gathered in original frame order on the host (frame index is the position in
the batch, so order is positional — no resorting needed).

TP/PP/SP/EP have no analog in a codec with no weights (SURVEY.md SS2
parallelism inventory): within-frame work is sequential (IIR) or tiny
(order-32 Levinson), so all scaling rides the frame axis. This matches
BASELINE.json configs 3-5.
"""
from __future__ import annotations

from functools import partial

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..codec.pipeline import decode_step as _decode_step
from ..codec.pipeline import encode_step as _encode_step


def data_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D mesh over `n_devices` (default: all visible) with axis 'data'."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), ("data",))


def pad_frames_to_multiple(x: np.ndarray, n_valid: np.ndarray, multiple: int):
    """Pad the frame axis so it divides evenly across the mesh."""
    F = x.shape[0]
    pad = (-F) % multiple
    if pad:
        x = np.concatenate([x, np.zeros((pad, *x.shape[1:]), x.dtype)], axis=0)
        n_valid = np.concatenate([n_valid, np.zeros(pad, n_valid.dtype)])
    return x, n_valid


def sharded_encode_step(mesh: Mesh, **static):
    """encode_step pjit'd over the mesh: frames sharded on 'data'.

    static: encode_step's static knobs (allow_ms, max_order, rice_k_max,
    fused) — pass fused=True on real TPU pods to use the Pallas kernels."""
    xs = NamedSharding(mesh, P("data"))
    return jax.jit(
        lambda x, nv: _encode_step.__wrapped__(x, nv, **static),
        in_shardings=(xs, xs),
        out_shardings=NamedSharding(mesh, P("data")),
    )


def sharded_decode_step(mesh: Mesh, iir: str = "scan"):
    xs = NamedSharding(mesh, P("data"))
    return jax.jit(
        lambda r, q, o, t: _decode_step.__wrapped__(r, q, o, t, iir=iir),
        in_shardings=(xs, xs, xs, xs),
        out_shardings=xs,
    )


def sharded_codec_step(mesh: Mesh, iir: str = "scan", **static):
    """Full encode->decode roundtrip step (the codec's 'training step'
    analog), pjit'd with frames sharded on 'data'. Returns PCM + a bit-exact
    roundtrip flag per frame — used by multi-chip dry runs and scaling tests.
    """
    xs = NamedSharding(mesh, P("data"))

    def step(x, n_valid):
        enc = _encode_step.__wrapped__(x, n_valid, **static)
        pcm = _decode_step.__wrapped__(
            enc["residues"], enc["qcoeffs"], enc["order"], enc["sftype"],
            iir=iir,
        )
        S = x.shape[-1]
        valid = (
            jax.numpy.arange(S)[None, None, :] < n_valid[:, None, None]
        )
        exact = jax.numpy.all(
            jax.numpy.where(valid, pcm == x, True), axis=(1, 2)
        )
        return pcm, exact

    return jax.jit(step, in_shardings=(xs, xs), out_shardings=(xs, xs))
