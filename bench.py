#!/usr/bin/env python
"""Driver benchmark entry: prints ONE JSON line (see sela_tpu/bench.py)."""
import os
import sys

if __name__ == "__main__":
    seconds = float(os.environ.get("SELA_BENCH_SECONDS", "300"))
    chunk = int(os.environ.get("SELA_BENCH_CHUNK_FRAMES", "4096"))
    iters = int(os.environ.get("SELA_BENCH_ITERS", "5"))
    n_chunks = int(os.environ.get("SELA_BENCH_CHUNKS", "8"))
    e2e_iters = int(os.environ.get("SELA_BENCH_E2E_ITERS", "3"))
    from sela_tpu.bench import run_bench

    run_bench(seconds=seconds, chunk_frames=chunk, iters=iters,
              n_chunks=n_chunks, e2e_iters=e2e_iters)
    sys.exit(0)
