"""Typed configuration for the codec and runtime (SURVEY.md §5 "Config").

The reference has no config system at all — positional argv only
(upstream:src/main.cpp, path-level cite — mount empty, SURVEY.md §5). Here
configuration splits into two frozen dataclasses:

* BitstreamProfile — knobs that change the emitted bytes. Defaults are the
  FORMAT.md v1 profile (reference-compatible values); validation enforces the
  container's hard caps so a misconfigured encoder can never emit a stream
  the spec'd decoder rejects. Non-default profiles still round-trip (the
  container carries per-frame sample counts and per-block k/order), but only
  the defaults are the normative v1 interchange profile.
* RuntimeConfig — knobs that only change HOW bytes are produced (chunking,
  engine/kernel selection, logging, profiling). Never affects output bytes:
  the same input + profile must produce identical containers under any
  runtime config (tested in tests/test_config.py).
"""
from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass

from .format import FRAME_SIZE, MAX_ORDER, RICE_K_MAX


@dataclass(frozen=True)
class BitstreamProfile:
    """Encoder-side choices that affect emitted bytes (decoder needs none of
    them — the container is self-describing within the FORMAT.md caps)."""

    frame_size: int = FRAME_SIZE        # samples/channel/frame, <= FRAME_SIZE
    max_order: int = MAX_ORDER          # LPC order search cap, <= MAX_ORDER
    rice_k_max: int = RICE_K_MAX        # optimal-k search cap, <= RICE_K_MAX
    # mid/side decision rule (non-normative — any choice decodes exactly):
    #   auto  — per-frame modeled-cost rule (fast: the normative render runs
    #           on winner rows only; measured <0.2% size delta vs exact)
    #   exact — per-frame exact padded-bits rule (renders all candidates;
    #           the oracle's rule, what the jax engine used in rounds 1-2)
    #   off   — direct L/R subframes only (mandatory for 32-bit PCM)
    mid_side: str = "auto"
    # 1 = one k per residue block (v1 default); RESIDUE_PARTS (4) = adaptive
    # partitioned residues (FORMAT.md §Partitioned residues): the encoder
    # emits the partitioned form only for subframes where it is smaller, so
    # ratio never regresses. Default-off to keep the v1 stream frozen.
    residue_partition: int = 1

    def validate(self) -> "BitstreamProfile":
        if not 32 <= self.frame_size <= FRAME_SIZE:
            raise ValueError(
                f"frame_size {self.frame_size} outside [32, {FRAME_SIZE}] "
                f"(container carries a u16 count capped at {FRAME_SIZE})")
        if not 1 <= self.max_order <= MAX_ORDER:
            raise ValueError(f"max_order {self.max_order} outside [1, {MAX_ORDER}]")
        if not 0 <= self.rice_k_max <= RICE_K_MAX:
            raise ValueError(f"rice_k_max {self.rice_k_max} outside [0, {RICE_K_MAX}]")
        if self.mid_side not in ("auto", "exact", "off"):
            raise ValueError(
                f"mid_side must be auto|exact|off, got {self.mid_side!r}")
        from .format import RESIDUE_PARTS

        if self.residue_partition not in (1, RESIDUE_PARTS):
            raise ValueError(
                f"residue_partition must be 1 or {RESIDUE_PARTS}, "
                f"got {self.residue_partition}")
        return self

    @property
    def is_v1_default(self) -> bool:
        return self == BitstreamProfile()


@dataclass(frozen=True)
class RuntimeConfig:
    """Execution knobs — must never change output bytes."""

    engine: str = "jax"                 # jax | ref (numpy oracle)
    chunk_frames: int = 512             # frames per jit'd device batch
    iir_kernel: str = "auto"            # auto | scan | pallas | pallas_generic
    log_json: bool = False              # structured JSON-lines metrics to stderr
    profile_dir: str | None = None      # jax.profiler trace output directory
    n_hosts: int = 1                    # multi-host shard count
    rank: int | None = None             # this host's rank (None = from env)

    def validate(self) -> "RuntimeConfig":
        if self.engine not in ("jax", "ref"):
            raise ValueError(f"engine must be jax|ref, got {self.engine!r}")
        if self.chunk_frames < 1:
            raise ValueError("chunk_frames must be >= 1")
        if self.iir_kernel not in ("auto", "scan", "pallas", "pallas_generic"):
            raise ValueError(f"bad iir_kernel {self.iir_kernel!r}")
        if self.n_hosts < 1:
            raise ValueError("n_hosts must be >= 1")
        return self

    def resolve_iir(self, bits_per_sample: int) -> str:
        """Pick the decode kernel: Pallas on TPU (limb kernel iff <=24-bit,
        generic hi/lo kernel for 32-bit), lax.scan elsewhere."""
        if self.iir_kernel != "auto":
            return self.iir_kernel
        from .utils.platform import backend_is_tpu

        if backend_is_tpu():
            return "pallas" if bits_per_sample <= 24 else "pallas_generic"
        return "scan"


def from_env(prefix: str = "SELA_") -> RuntimeConfig:
    """RuntimeConfig overrides from environment (SELA_CHUNK_FRAMES etc.)."""
    kw = {}
    for f in dataclasses.fields(RuntimeConfig):
        v = os.environ.get(prefix + f.name.upper())
        if v is None:
            continue
        if f.type in ("int", "int | None"):
            kw[f.name] = int(v)
        elif f.type == "bool":
            kw[f.name] = v.lower() in ("1", "true", "yes")
        else:
            kw[f.name] = v
    return RuntimeConfig(**kw).validate()
