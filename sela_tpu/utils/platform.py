"""Platform selection helpers for the quirky sandbox environment.

The build/test sandbox injects an `axon` TPU PJRT plugin into every process
(sitecustomize) and defaults JAX_PLATFORMS=axon. For host-side CPU runs the
registered-but-unused plugin can destabilize jax (see tests/conftest.py);
force_cpu() removes it before any backend initializes.
"""
from __future__ import annotations


def enable_compile_cache(path: str = "/root/repo/.jax_cache") -> None:
    """Persistent XLA compilation cache.

    The sandbox TPU compiles via a remote tunnel that can take tens of
    seconds per executable; caching compiled binaries on disk makes repeat
    runs (bench reruns, driver checks) start fast.
    """
    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def force_cpu() -> None:
    """Use the CPU backend, unregistering the axon plugin if present.

    Must be called before the first jax computation/backend init.
    """
    from jax._src import xla_bridge

    xla_bridge._backend_factories.pop("axon", None)
    import jax

    jax.config.update("jax_platforms", "cpu")


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
