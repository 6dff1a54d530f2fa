"""Real multi-process distributed tests (SURVEY.md §4 item 4, §5 failure
detection): 2 OS processes coordinate via jax.distributed on localhost,
encode disjoint frame ranges, and the rank-ordered merge is bit-exact vs a
single-process encode. Fault injection: kill one worker mid-encode, detect
the missing shard, re-run it, and converge to identical bytes."""
import os
import signal
import socket
import subprocess
import sys
import time

import numpy as np
import pytest

from sela_tpu.parallel import multihost
from sela_tpu.ref.wav import WavData, write_wav

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tools", "shard_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _spawn(rank: int, n: int, port: int, wav: str, out: str, extra=()):
    env = dict(os.environ)
    env.update(
        JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
        JAX_NUM_PROCESSES=str(n),
        JAX_PROCESS_ID=str(rank),
        JAX_PLATFORMS="cpu",
    )
    env.pop("XLA_FLAGS", None)  # workers don't need the 8-device fake
    return subprocess.Popen(
        [sys.executable, WORKER, wav, out, *extra],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
    )


def make_wav(rng, signal_factory, n=2048 * 4 + 200):
    return WavData(
        44100, 16,
        [signal_factory(rng, n, kind="ar"), signal_factory(rng, n, kind="tone")],
    )


@pytest.mark.slow
def test_two_process_shard_encode_bit_exact(tmp_path, rng, signal_factory):
    from sela_tpu.codec.encoder import encode_wav

    w = make_wav(rng, signal_factory)
    wav_path = str(tmp_path / "in.wav")
    write_wav(wav_path, w)
    out_dir = str(tmp_path / "shards")
    port = _free_port()
    procs = [_spawn(r, 2, port, wav_path, out_dir) for r in range(2)]
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, err.decode()[-2000:]
    assert multihost.missing_shards(out_dir, 2) == []
    merged_path = str(tmp_path / "merged.sela")
    multihost.merge_shards(out_dir, 2, merged_path)
    single = encode_wav(w, chunk_frames=8)
    assert open(merged_path, "rb").read() == single


@pytest.mark.slow
def test_fault_injection_kill_and_recover(tmp_path, rng, signal_factory):
    """Kill rank 1 mid-encode (SIGKILL, exact PID); the manifest layer must
    report it missing, and re-running only that rank must converge to bytes
    identical to the unfaulted run."""
    from sela_tpu.codec.encoder import encode_wav

    w = make_wav(rng, signal_factory)
    wav_path = str(tmp_path / "in.wav")
    write_wav(wav_path, w)
    out_dir = str(tmp_path / "shards")

    # ranks run WITHOUT a coordinator (rank passed via env JAX_PROCESS_ID
    # would need both processes alive for the handshake — the fault case is
    # exactly when one is not, so shards here use explicit --rank paths
    # through the same worker via env-free single-process mode)
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["SELA_CACHE_DIR"] = os.path.join(REPO, ".jax_cache")  # share suite cache

    def run_rank(rank: int, slow_ms: int = 0):
        e = dict(env)
        # no coordinator: emulate the scheduler assigning ranks; worker
        # falls back to (0,1) from init_distributed, so drive encode_shard
        # through the CLI instead for explicit rank addressing
        cmd = [
            sys.executable, "-m", "sela_tpu.cli", "encode-shard", wav_path,
            out_dir, "--rank", str(rank), "--n-hosts", "2", "--cpu",
            "--chunk-frames", "8",
        ]
        return subprocess.Popen(cmd, env=e, stdout=subprocess.PIPE,
                                stderr=subprocess.PIPE, cwd=REPO)

    p0 = run_rank(0)
    p1 = run_rank(1)
    time.sleep(1.0)  # mid-compile/encode, well before .done appears
    os.kill(p1.pid, signal.SIGKILL)  # exact PID, never a pattern
    p1.wait(timeout=60)
    out, err = p0.communicate(timeout=600)
    assert p0.returncode == 0, err.decode()[-2000:]

    missing = multihost.missing_shards(out_dir, 2)
    assert missing == [1], f"expected rank 1 missing, got {missing}"
    with pytest.raises(RuntimeError, match="missing shards"):
        multihost.merge_shards(out_dir, 2, str(tmp_path / "x.sela"))

    # recovery: re-run the dead rank only (stateless shards)
    p1b = run_rank(1)
    out, err = p1b.communicate(timeout=600)
    assert p1b.returncode == 0, err.decode()[-2000:]
    assert multihost.missing_shards(out_dir, 2) == []
    merged_path = str(tmp_path / "merged.sela")
    multihost.merge_shards(out_dir, 2, merged_path)
    assert open(merged_path, "rb").read() == encode_wav(w, chunk_frames=8)
