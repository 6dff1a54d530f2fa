"""Structured metrics/observability (SURVEY.md §5 "Metrics / logging").

The reference prints wall-clock seconds to stdout and nothing else
(upstream:src/main.cpp, path-level cite — mount empty). Here every codec
entry point can be handed a Metrics sink that accumulates counters
(frames, bytes in/out) and per-stage wall times, and can emit one
JSON-lines record per operation — machine-parseable (`--log-json`) and
cheap enough to stay on in production (a few dict updates per device chunk;
the device path is untouched).

Stage-name semantics (JAX dispatch is asynchronous, so host wall-time
buckets do NOT equal device busy-time):
  encode: "device_dispatch" — host cost of async-dispatching a chunk's jit
          call (trace/arg staging only, NOT device compute);
          "device_fetch"    — wait for device completion + D2H of planning
          arrays (device compute time hides here, minus whatever overlapped
          host packing); "host_pack" — Rice pack + container serialize.
  decode: "host_parse" — container scan; "host_unpack" — Rice unpack +
          scatter + async dispatch; "device_fetch" — device wait + D2H PCM.
For true device busy-time use `--profile-trace` (jax.profiler), not these.
"""
from __future__ import annotations

import json
import sys
import time
from contextlib import contextmanager


class Metrics:
    """Counter + stage-timer accumulator with JSON-lines emission."""

    def __init__(self, sink=None):
        self.counters: dict[str, float] = {}
        self.stage_s: dict[str, float] = {}
        self.stage_n: dict[str, int] = {}
        self._sink = sink  # file-like; defaults to stderr at emit time

    def count(self, name: str, delta: float = 1) -> None:
        self.counters[name] = self.counters.get(name, 0) + delta

    @contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.stage_s[name] = self.stage_s.get(name, 0.0) + dt
            self.stage_n[name] = self.stage_n.get(name, 0) + 1

    def snapshot(self, op: str) -> dict:
        rec: dict = {"op": op, "ts": time.time()}
        rec.update(self.counters)
        pcm = self.counters.get("pcm_bytes")
        coded = self.counters.get("coded_bytes")
        if pcm and coded:
            rec["ratio"] = round(coded / pcm, 6)
        total_s = sum(self.stage_s.values())
        if pcm and total_s > 0:
            rec["mb_per_s"] = round(pcm / total_s / 1e6, 3)
        frames = self.counters.get("frames")
        for name, s in self.stage_s.items():
            rec[f"{name}_s"] = round(s, 6)
            if frames:
                rec[f"{name}_us_per_frame"] = round(s / frames * 1e6, 3)
        return rec

    def emit(self, op: str) -> dict:
        """Write one JSON line describing this operation; returns the record."""
        rec = self.snapshot(op)
        print(json.dumps(rec), file=self._sink or sys.stderr, flush=True)
        return rec


class _NullMetrics(Metrics):
    """No-op sink — zero overhead beyond a context-manager enter/exit."""

    def count(self, name, delta=1):
        pass

    @contextmanager
    def stage(self, name):
        yield

    def emit(self, op):
        return {}


NULL_METRICS = _NullMetrics()


@contextmanager
def profiler_trace(log_dir: str | None):
    """jax.profiler trace scope (TensorBoard/Perfetto) when log_dir is set.

    SURVEY.md §5 "Tracing / profiling": the TPU-native answer to the
    reference's printf timing. View with `tensorboard --logdir <dir>` or
    upload the .perfetto-trace to ui.perfetto.dev.
    """
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
