"""Platform selection helpers for the quirky sandbox environment.

The build/test sandbox injects an `axon` TPU PJRT plugin into every process
(sitecustomize) and defaults JAX_PLATFORMS=axon. For host-side CPU runs the
registered-but-unused plugin can destabilize jax (see tests/conftest.py);
force_cpu() removes it before any backend initializes.
"""
from __future__ import annotations


def host_fingerprint() -> str:
    """Short stable id of THIS machine's CPU feature set.

    XLA's persistent-cache key does NOT include host CPU features, but its
    CPU backend caches AOT machine code. /root/repo is a volume shared
    between sandbox machines with different CPUs, so an unscoped cache dir
    hands one machine another machine's native code. Observed failure modes
    of exactly that (round 4): cpu_aot_loader feature-mismatch errors
    ("could lead to execution errors such as SIGILL"), an encode dispatch
    spinning forever inside one Eigen thread while np.asarray blocks in
    jax.Array._value (the "flaky CPU hang" tests/conftest.py had blamed on
    the axon plugin), and a foreign executable emitting different bytes
    than a natively compiled one.
    """
    import hashlib
    import platform

    try:
        with open("/proc/cpuinfo") as f:
            flags = next(
                (ln for ln in f.read().splitlines()
                 if ln.startswith("flags")),
                platform.processor(),
            )
    except OSError:  # pragma: no cover
        flags = platform.processor()
    return hashlib.sha256(flags.encode()).hexdigest()[:12]


def enable_compile_cache(path: str = "/root/repo/.jax_cache") -> None:
    """Persistent XLA compilation cache, host-scoped only for CPU backends.

    The sandbox TPU compiles via a remote tunnel that can take tens of
    seconds per executable; caching compiled binaries on disk makes repeat
    runs (bench reruns, driver checks) start fast.

    Scoping (ADVICE r4): TPU executables are compiled by the TPU toolchain
    and contain no host-CPU machine code, so they live in a shared "tpu"
    subdirectory that stays warm across sandbox machines. Only CPU-backend
    runs use the per-host fingerprint subdirectory — XLA:CPU caches AOT
    *host* machine code whose cache key ignores CPU features, and /root/repo
    is a volume shared between machines with different CPUs (see
    host_fingerprint() for the observed SIGILL/hang failure modes).
    """
    import os

    import jax

    sub = "tpu" if backend_is_tpu() else host_fingerprint()
    jax.config.update("jax_compilation_cache_dir", os.path.join(path, sub))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def force_cpu() -> None:
    """Use the CPU backend, unregistering the axon plugin if present.

    Must be called before the first jax computation/backend init.
    """
    import os

    from jax._src import xla_bridge

    xla_bridge._backend_factories.pop("axon", None)
    import jax

    os.environ["JAX_PLATFORMS"] = "cpu"  # keep backend_is_tpu() consistent
    jax.config.update("jax_platforms", "cpu")


def backend_is_tpu() -> bool:
    """True iff jax will run on TPU — WITHOUT initializing any backend when
    the platform is already pinned by config or environment.

    Asking `jax.default_backend()` initializes the runtime. In this sandbox
    that means creating the axon tunnel client (~70 s measured) even for
    pure-CPU work — and a live-but-unused axon client poisons subsequent CPU
    dispatch (measured: ~55 s per 8-frame encode chunk vs ~0.3 s clean; the
    same class of hang tests/conftest.py documents). Library code that only
    needs "am I on TPU?" (kernel selection, fused-path defaults) must
    therefore consult the static pins first and touch the backend only when
    the answer cannot be known without it.
    """
    import os

    import jax

    # config before env: backend selection reads jax.config.jax_platforms,
    # which snapshots JAX_PLATFORMS at import and is only changed by an
    # explicit jax.config.update (verified: mutating the env post-import
    # leaves the config — and therefore the chosen backend — untouched).
    # A caller that pins CPU via config alone must get the CPU answer even
    # while the sandbox env still says 'axon' (ADVICE r4). The env fallback
    # only matters when jax was imported with the config left unset.
    pinned = (jax.config.jax_platforms or "") or os.environ.get(
        "JAX_PLATFORMS", "")
    if pinned:
        return pinned.split(",")[0].strip().lower() in ("tpu", "axon")
    return jax.default_backend() == "tpu"


def respect_platform_env() -> None:
    """Honor JAX_PLATFORMS=cpu SAFELY in this sandbox.

    Merely setting the env var selects the CPU backend but leaves the axon
    plugin registered, and a registered-but-unused axon plugin makes CPU
    computations hang flakily (tests/conftest.py documents the measurement).
    Entry points (CLI, bench) call this before any jax computation so that
    the documented `JAX_PLATFORMS=cpu selax ...` recipe actually works.
    """
    import os

    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        force_cpu()
