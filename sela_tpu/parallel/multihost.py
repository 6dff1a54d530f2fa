"""Multi-host corpus encoding: frame-range sharding + ordered manifest merge.

BASELINE.json config #5 ("multi-hour audio corpus sharded across N>=2 hosts,
ordered gather into SELA containers"). The reference has no multi-process
story at all (single process, std::thread — SURVEY.md SS2 "Communication
backend: None"); this module is the TPU-native equivalent designed around
two facts: frames are stateless and analysis is deterministic per frame, so

  * a long file splits into contiguous FRAME RANGES, one per host;
  * each host encodes its range with the jit'd pipeline and writes the
    serialized frames to `part-<rank>.selapart` plus a JSON manifest
    (frame counts, byte sizes, sha256) and a `.done` marker;
  * the merge concatenates parts in rank order after the global header —
    bit-identical to a single-host encode of the same file;
  * recovery = re-run any rank whose `.done` marker is missing (stateless
    shards make failure handling trivial — SURVEY.md SS5).

Variable-length encoded frames therefore never cross hosts: the "ordered
gather" is rank-ordered file concatenation on the merge side, keeping DCN
out of the data path entirely (the only cross-host coordination is the
filesystem manifest).

jax.distributed bootstrap for real pods is in init_distributed(); tests
exercise the shard/merge logic in-process and via the CLI.
"""
from __future__ import annotations

import hashlib
import json
import os
import time

import numpy as np

from ..format import FRAME_SIZE
from ..ref import container
from ..ref.wav import WavData


def init_distributed() -> tuple[int, int]:
    """Initialize jax.distributed from standard env vars if present.

    JAX_COORDINATOR_ADDRESS is read by jax itself; JAX_NUM_PROCESSES /
    JAX_PROCESS_ID are forwarded explicitly (jax reads them from cluster
    schedulers, not the generic environment). Returns (process_index,
    process_count); a no-op (0, 1) without a coordinator address.
    """
    import jax

    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        kw = {}
        if os.environ.get("JAX_NUM_PROCESSES"):
            kw["num_processes"] = int(os.environ["JAX_NUM_PROCESSES"])
            kw["process_id"] = int(os.environ["JAX_PROCESS_ID"])
        jax.distributed.initialize(**kw)
        return jax.process_index(), jax.process_count()
    return 0, 1


def frame_ranges(n_samples: int, n_hosts: int, frame_size: int = FRAME_SIZE):
    """Contiguous frame ranges [(lo, hi)) per host; near-equal sizes."""
    n_frames = -(-n_samples // frame_size)
    base = n_frames // n_hosts
    extra = n_frames % n_hosts
    ranges = []
    lo = 0
    for h in range(n_hosts):
        hi = lo + base + (1 if h < extra else 0)
        ranges.append((lo, hi))
        lo = hi
    return ranges


def _part_path(out_dir: str, rank: int) -> str:
    return os.path.join(out_dir, f"part-{rank:04d}.selapart")


def _manifest_path(out_dir: str, rank: int) -> str:
    return os.path.join(out_dir, f"part-{rank:04d}.manifest.json")


def _done_path(out_dir: str, rank: int) -> str:
    return os.path.join(out_dir, f"part-{rank:04d}.done")


def encode_shard(w: WavData, out_dir: str, rank: int, n_hosts: int,
                 chunk_frames: int = 512, frame_size: int = FRAME_SIZE) -> dict:
    """Encode this host's frame range of `w` and write part + manifest."""
    from ..codec.encoder import encode_wav

    os.makedirs(out_dir, exist_ok=True)
    lo, hi = frame_ranges(w.n_samples, n_hosts, frame_size)[rank]
    s_lo = lo * frame_size
    s_hi = min(hi * frame_size, w.n_samples)
    shard = WavData(
        w.sample_rate, w.bits_per_sample, [c[s_lo:s_hi] for c in w.channels]
    )
    t0 = time.perf_counter()
    if s_hi > s_lo:
        buf = encode_wav(shard, frame_size=frame_size, chunk_frames=chunk_frames)
        frames_bytes = buf[container.HEADER_SIZE :]  # strip the shard header
        n_frames = container.parse_header(buf).num_frames
    else:
        frames_bytes = b""
        n_frames = 0
    wall_s = time.perf_counter() - t0
    pcm_bytes = (s_hi - s_lo) * w.n_channels * w.bits_per_sample // 8
    with open(_part_path(out_dir, rank), "wb") as f:
        f.write(frames_bytes)
    manifest = {
        "rank": rank,
        "n_hosts": n_hosts,
        "frame_lo": lo,
        "frame_hi": hi,
        "n_frames": n_frames,
        "bytes": len(frames_bytes),
        "sha256": hashlib.sha256(frames_bytes).hexdigest(),
        "sample_rate": w.sample_rate,
        "bits_per_sample": w.bits_per_sample,
        "channels": w.n_channels,
        "n_samples": w.n_samples,
        # observability (SURVEY.md §5): per-shard throughput for scaling-
        # efficiency and load-balance accounting at merge time
        "wall_s": round(wall_s, 6),
        "pcm_bytes": pcm_bytes,
        "mb_per_s": round(pcm_bytes / wall_s / 1e6, 3) if wall_s > 0 else 0.0,
    }
    with open(_manifest_path(out_dir, rank), "w") as f:
        json.dump(manifest, f)
    with open(_done_path(out_dir, rank), "w") as f:
        f.write("ok\n")
    return manifest


def scaling_efficiency(single_host_wall_s: float, manifests: list[dict]) -> float:
    """Classic strong-scaling efficiency T_1 / (N * T_N).

    T_N is the slowest shard's wall time (the corpus completes when the last
    host does). The BASELINE.md target is >= 0.80 on N >= 2 hosts."""
    t_n = max(m["wall_s"] for m in manifests)
    return single_host_wall_s / (len(manifests) * t_n) if t_n > 0 else 0.0


def missing_shards(out_dir: str, n_hosts: int) -> list[int]:
    """Ranks whose done-marker (or part/manifest) is absent — re-run these."""
    out = []
    for rank in range(n_hosts):
        if not (
            os.path.exists(_done_path(out_dir, rank))
            and os.path.exists(_part_path(out_dir, rank))
            and os.path.exists(_manifest_path(out_dir, rank))
        ):
            out.append(rank)
    return out


def merge_shards(out_dir: str, n_hosts: int, out_path: str) -> dict:
    """Rank-ordered concatenation of parts into one bit-exact container."""
    missing = missing_shards(out_dir, n_hosts)
    if missing:
        raise RuntimeError(f"missing shards: {missing} — re-run encode_shard")
    manifests = []
    for rank in range(n_hosts):
        with open(_manifest_path(out_dir, rank)) as f:
            manifests.append(json.load(f))
    m0 = manifests[0]
    total_frames = sum(m["n_frames"] for m in manifests)
    header = container.SelaHeader(
        m0["sample_rate"], m0["bits_per_sample"], m0["channels"], total_frames
    )
    with open(out_path, "wb") as out:
        out.write(container.serialize_file(header, []))
        for rank, m in enumerate(manifests):
            with open(_part_path(out_dir, rank), "rb") as f:
                data = f.read()
            if hashlib.sha256(data).hexdigest() != m["sha256"]:
                raise RuntimeError(f"shard {rank}: checksum mismatch — corrupt part")
            out.write(data)
    info = {"frames": total_frames, "hosts": n_hosts, "path": out_path}
    walls = [m.get("wall_s", 0.0) for m in manifests]
    if all(t > 0 for t in walls):
        total_pcm = sum(m.get("pcm_bytes", 0) for m in manifests)
        # corpus completes when the slowest shard does; balance = 1.0 means
        # perfectly even shard times (the scaling-efficiency denominator)
        info["wall_max_s"] = round(max(walls), 6)
        info["wall_mean_s"] = round(sum(walls) / len(walls), 6)
        info["balance"] = round(info["wall_mean_s"] / info["wall_max_s"], 4)
        info["aggregate_mb_per_s"] = round(total_pcm / max(walls) / 1e6, 3)
    return info
