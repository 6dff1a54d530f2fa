"""Multi-process shard-encode worker (spawned by tests/test_distributed.py).

One real OS process per "host": initializes jax.distributed from env vars
(JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID — the standard
cluster bootstrap, SURVEY.md §5 "Distributed communication backend"), then
encodes this rank's frame range of the input WAV and writes its shard part +
manifest + done marker. Exercises the REAL process-separation path that
in-process tests cannot: separate jax runtimes, coordination-service
handshake, filesystem-only cross-host communication.

Usage: python tools/shard_worker.py <in.wav> <out_dir> [--slow-ms N]
           [--rank R --n-hosts N] [--chunk-frames F]

With --rank/--n-hosts the jax.distributed handshake is skipped (filesystem-
only coordination — the mode tools/measure_scaling.py uses to time shards
under pinned, equal per-host CPU resources).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jax._src import xla_bridge  # noqa: E402

xla_bridge._backend_factories.pop("axon", None)
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# host-scoped persistent cache (NOT the bare .jax_cache root: /root/repo is
# shared between machines and XLA:CPU entries embed native AOT code — see
# utils.platform.host_fingerprint for the observed failure modes)
from sela_tpu.utils.platform import enable_compile_cache  # noqa: E402

enable_compile_cache()


def _flag(name: str, default=None):
    if name in sys.argv:
        return sys.argv[sys.argv.index(name) + 1]
    return default


def main() -> int:
    wav_path, out_dir = sys.argv[1], sys.argv[2]
    slow_ms = int(_flag("--slow-ms", 0))
    chunk_frames = int(_flag("--chunk-frames", 8))
    rank_arg = _flag("--rank")

    from sela_tpu.parallel.multihost import encode_shard, init_distributed
    from sela_tpu.ref.wav import read_wav

    if rank_arg is not None:
        rank, n_hosts = int(rank_arg), int(_flag("--n-hosts"))
    else:
        rank, n_hosts = init_distributed()
        assert n_hosts == int(os.environ["JAX_NUM_PROCESSES"])
    w = read_wav(wav_path)
    if slow_ms:
        # deterministic window for the fault-injection test to kill us in
        time.sleep(slow_ms / 1000.0)
    m = encode_shard(w, out_dir, rank, n_hosts, chunk_frames=chunk_frames)
    print(f"rank {rank}/{n_hosts}: frames [{m['frame_lo']}, {m['frame_hi']}) "
          f"{m['bytes']}B {m['sha256'][:8]}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
