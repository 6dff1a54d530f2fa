"""Measure multi-host scaling efficiency for real (VERDICT r1 item 6).

Drives N-rank `encode_shard` runs as separate OS processes (the same worker
harness a pod would run per host) and computes
`parallel.multihost.scaling_efficiency()` — T1 / (N * max(T_shard)) — from
the written manifests against a measured single-rank wall.

Resource model on a shared dev box: every process (baseline AND shards) is
pinned with `taskset` to the SAME number of dedicated cores, so each "host"
gets equal compute, exactly like a pod. When the machine has fewer cores
than ranks, shards run SEQUENTIALLY (each still pinned); shards share
nothing but the filesystem, so per-shard walls are identical either way —
the artifact records which mode produced each number.

The merged N-host container is asserted byte-identical (sha256) to the
single-host encode — the ordered-gather bit-exactness criterion from
BASELINE.json config #5 — before any efficiency number is reported.

Usage:
    python tools/measure_scaling.py [--seconds 48] [--ranks 2,4]
                                    [--out SCALING.json] [--chunk-frames 256]
"""
from __future__ import annotations

import argparse
import hashlib
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
WORKER = os.path.join(REPO, "tools", "shard_worker.py")


def _run_rank(wav: str, out_dir: str, rank: int, n_hosts: int,
              chunk_frames: int, cores: list[int]) -> subprocess.Popen:
    cmd = ["taskset", "-c", ",".join(map(str, cores)), sys.executable, WORKER,
           wav, out_dir, "--rank", str(rank), "--n-hosts", str(n_hosts),
           "--chunk-frames", str(chunk_frames)]
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    return subprocess.Popen(cmd, env=env, stdout=subprocess.DEVNULL,
                            stderr=subprocess.DEVNULL)


def _manifests(out_dir: str, n_hosts: int) -> list[dict]:
    out = []
    for rank in range(n_hosts):
        with open(os.path.join(out_dir, f"part-{rank:04d}.manifest.json")) as f:
            out.append(json.load(f))
    return out


def measure(seconds: float, ranks: list[int], chunk_frames: int,
            cores_per_host: int | None = None) -> dict:
    from sela_tpu.bench import make_corpus
    from sela_tpu.parallel.multihost import merge_shards, scaling_efficiency
    from sela_tpu.ref.wav import WavData, write_wav

    ncores = os.cpu_count() or 1
    cores_per_host = cores_per_host or max(1, ncores // max(ranks))
    tmp = tempfile.mkdtemp(prefix="sela-scaling-")
    wav = os.path.join(tmp, "corpus.wav")
    left, right = make_corpus(seconds, seed=5)
    write_wav(wav, WavData(44100, 16, [left, right]))
    pcm_mb = len(left) * 2 * 2 / 1e6

    # warm the persistent compile cache so wall_s measures compute, not XLA
    # compilation (one throwaway 1-host run; same jit signature as all runs)
    d_warm = os.path.join(tmp, "warm")
    p = _run_rank(wav, d_warm, 0, 1, chunk_frames,
                  list(range(cores_per_host)))
    assert p.wait() == 0, "warmup rank failed"

    # baseline: single host on cores_per_host dedicated cores
    d1 = os.path.join(tmp, "n1")
    p = _run_rank(wav, d1, 0, 1, chunk_frames, list(range(cores_per_host)))
    assert p.wait() == 0, "baseline rank failed"
    m1 = _manifests(d1, 1)[0]
    t1 = m1["wall_s"]
    single = os.path.join(tmp, "single.sela")
    merge_shards(d1, 1, single)
    ref_sha = hashlib.sha256(open(single, "rb").read()).hexdigest()
    print(f"[scaling] baseline T1={t1:.2f}s on {cores_per_host} core(s), "
          f"{pcm_mb:.0f} MB PCM ({pcm_mb/t1:.1f} MB/s)", file=sys.stderr)

    results = {"pcm_mb": round(pcm_mb, 1), "t1_s": round(t1, 3),
               "cores_per_host": cores_per_host, "machine_cores": ncores,
               "chunk_frames": chunk_frames, "runs": {}}
    for n in ranks:
        d = os.path.join(tmp, f"n{n}")
        concurrent = n * cores_per_host <= ncores
        procs = []
        for rank in range(n):
            cores = [(rank * cores_per_host + i) % ncores
                     for i in range(cores_per_host)]
            p = _run_rank(wav, d, rank, n, chunk_frames, cores)
            if not concurrent:
                assert p.wait() == 0, f"rank {rank}/{n} failed"
            else:
                procs.append(p)
        for p in procs:
            assert p.wait() == 0, "concurrent rank failed"
        ms = _manifests(d, n)
        eff = scaling_efficiency(t1, ms)
        merged = os.path.join(tmp, f"merged-n{n}.sela")
        info = merge_shards(d, n, merged)
        sha = hashlib.sha256(open(merged, "rb").read()).hexdigest()
        assert sha == ref_sha, f"N={n} merge is not bit-exact vs single host"
        results["runs"][str(n)] = {
            "efficiency": round(eff, 4),
            "mode": "concurrent" if concurrent else "sequential",
            "wall_s": [round(m["wall_s"], 3) for m in ms],
            "balance": info.get("balance"),
            "bit_exact_merge": True,
        }
        print(f"[scaling] N={n} ({results['runs'][str(n)]['mode']}): "
              f"efficiency={eff:.3f}, walls={results['runs'][str(n)]['wall_s']}",
              file=sys.stderr)
    return results


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=48.0)
    ap.add_argument("--ranks", default="2,4")
    ap.add_argument("--chunk-frames", type=int, default=256)
    ap.add_argument("--cores-per-host", type=int, default=None)
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)
    ranks = [int(r) for r in args.ranks.split(",")]
    results = measure(args.seconds, ranks, args.chunk_frames,
                      args.cores_per_host)
    line = json.dumps(results)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    worst = min(r["efficiency"] for r in results["runs"].values())
    return 0 if worst >= 0.80 else 1


if __name__ == "__main__":
    sys.exit(main())
