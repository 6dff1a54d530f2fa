"""Multi-host shard/merge: bit-exact vs single-host, failure recovery."""
import numpy as np
import pytest

from sela_tpu.codec.encoder import encode_wav
from sela_tpu.parallel import multihost
from sela_tpu.ref import codec as ref_codec
from sela_tpu.ref.wav import WavData

CHUNK = 8


def make_long_wav(rng, signal_factory, n=2048 * 7 + 300):
    return WavData(
        44100, 16,
        [signal_factory(rng, n, kind="ar"), signal_factory(rng, n, kind="tone")],
    )


def test_frame_ranges_cover_exactly():
    for n_samples, hosts in [(2048 * 7 + 300, 3), (2048, 2), (100, 4), (2048 * 8, 4)]:
        r = multihost.frame_ranges(n_samples, hosts)
        n_frames = -(-n_samples // 2048)
        assert r[0][0] == 0 and r[-1][1] == n_frames
        for (a, b), (c, d) in zip(r, r[1:]):
            assert b == c


def test_sharded_encode_merges_bit_exact(tmp_path, rng, signal_factory):
    w = make_long_wav(rng, signal_factory)
    single = encode_wav(w, chunk_frames=CHUNK)
    n_hosts = 3
    for rank in range(n_hosts):
        multihost.encode_shard(w, str(tmp_path), rank, n_hosts, chunk_frames=CHUNK)
    out_path = str(tmp_path / "merged.sela")
    info = multihost.merge_shards(str(tmp_path), n_hosts, out_path)
    merged = open(out_path, "rb").read()
    assert merged == single  # rank-ordered gather is bit-exact
    dec = ref_codec.decode_sela(merged)
    for a, b in zip(dec.channels, w.channels):
        np.testing.assert_array_equal(a, b)
    assert info["frames"] == -(-w.n_samples // 2048)


def test_missing_shard_detected_and_recoverable(tmp_path, rng, signal_factory):
    w = make_long_wav(rng, signal_factory, n=2048 * 5)
    n_hosts = 2
    multihost.encode_shard(w, str(tmp_path), 0, n_hosts, chunk_frames=CHUNK)
    assert multihost.missing_shards(str(tmp_path), n_hosts) == [1]
    with pytest.raises(RuntimeError, match="missing shards"):
        multihost.merge_shards(str(tmp_path), n_hosts, str(tmp_path / "x.sela"))
    # recovery: run the missing rank, merge succeeds and matches single-host
    multihost.encode_shard(w, str(tmp_path), 1, n_hosts, chunk_frames=CHUNK)
    multihost.merge_shards(str(tmp_path), n_hosts, str(tmp_path / "x.sela"))
    assert open(tmp_path / "x.sela", "rb").read() == encode_wav(w, chunk_frames=CHUNK)


def test_corrupt_part_rejected(tmp_path, rng, signal_factory):
    w = make_long_wav(rng, signal_factory, n=2048 * 4)
    for rank in range(2):
        multihost.encode_shard(w, str(tmp_path), rank, 2, chunk_frames=CHUNK)
    p = tmp_path / "part-0001.selapart"
    data = bytearray(p.read_bytes())
    data[10] ^= 0xFF
    p.write_bytes(bytes(data))
    with pytest.raises(RuntimeError, match="checksum"):
        multihost.merge_shards(str(tmp_path), 2, str(tmp_path / "x.sela"))


def test_more_hosts_than_frames(tmp_path, rng, signal_factory):
    w = make_long_wav(rng, signal_factory, n=2048 * 2)  # 2 frames, 4 hosts
    for rank in range(4):
        multihost.encode_shard(w, str(tmp_path), rank, 4, chunk_frames=CHUNK)
    multihost.merge_shards(str(tmp_path), 4, str(tmp_path / "x.sela"))
    assert open(tmp_path / "x.sela", "rb").read() == encode_wav(w, chunk_frames=CHUNK)


def test_manifest_throughput_counters(tmp_path, rng, signal_factory):
    """Shard manifests carry wall/throughput counters; merge aggregates them
    (SURVEY.md §5 metrics; BASELINE.md scaling-efficiency accounting)."""
    import json

    w = make_long_wav(rng, signal_factory, n=2048 * 4)
    for rank in range(2):
        m = multihost.encode_shard(w, str(tmp_path), rank, 2, chunk_frames=CHUNK)
        assert m["wall_s"] > 0
        assert m["pcm_bytes"] == 2048 * 2 * 2 * 2
        assert m["mb_per_s"] > 0
    info = multihost.merge_shards(str(tmp_path), 2, str(tmp_path / "m.sela"))
    assert 0 < info["balance"] <= 1.0
    assert info["aggregate_mb_per_s"] > 0
    assert info["wall_max_s"] >= info["wall_mean_s"]
    manifests = [
        json.load(open(tmp_path / f"part-{r:04d}.manifest.json")) for r in (0, 1)
    ]
    eff = multihost.scaling_efficiency(2 * info["wall_mean_s"], manifests)
    assert eff > 0
