"""Test config: run the whole suite on CPU with 8 virtual devices so the
multi-chip sharding path is exercised without TPU hardware (SURVEY.md SS4).

ENVIRONMENT QUIRK (load-bearing): this sandbox injects an `axon` TPU PJRT
plugin into every Python process via PYTHONPATH=/root/.axon_site
sitecustomize (which also imports jax at interpreter startup), and sets
JAX_PLATFORMS=axon. With the plugin registered, even CPU-backend jax
computations hang flakily (observed: np.asarray(jax_array) blocking forever
in jax.Array._value on an idle machine; 100% reliable with the plugin
removed). jax is already imported by the time pytest loads this file, but no
backend has been initialized yet — so we unregister the axon backend factory
and force the CPU platform before any computation runs.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

from jax._src import xla_bridge  # noqa: E402

xla_bridge._backend_factories.pop("axon", None)
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: the suite's many jit signatures (static profile
# knobs, chunk shapes) compile once per machine instead of once per run.
# MUST be per-host-scoped: /root/repo is shared between machines with
# different CPUs, and XLA:CPU cache entries embed native AOT code — loading
# a foreign machine's entry hangs or miscomputes (utils.platform has the
# full post-mortem; this was the real cause of the "flaky CPU hang" the
# docstring above used to pin solely on the axon plugin).
from sela_tpu.utils.platform import enable_compile_cache  # noqa: E402

enable_compile_cache()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def make_signal(rng, n, amp=20000, kind="ar"):
    """Synthetic test signals: AR process (LPC-friendly), noise, tones."""
    if kind == "ar":
        e = rng.normal(0, amp / 50, n)
        x = np.zeros(n)
        a1, a2 = 1.6, -0.7
        for i in range(n):
            x[i] = e[i] + a1 * (x[i - 1] if i > 0 else 0) + a2 * (x[i - 2] if i > 1 else 0)
        x = np.clip(x, -amp, amp)
    elif kind == "noise":
        x = rng.integers(-amp, amp, n)
    elif kind == "tone":
        t = np.arange(n)
        x = amp * 0.8 * np.sin(2 * np.pi * 440 * t / 44100)
    elif kind == "silence":
        x = np.zeros(n)
    elif kind == "impulse":
        x = np.zeros(n)
        x[n // 2] = amp
    elif kind == "dc":
        x = np.full(n, amp // 2)
    else:
        raise ValueError(kind)
    return np.asarray(np.round(x), dtype=np.int32)


@pytest.fixture
def signal_factory():
    return make_signal
