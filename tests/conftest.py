"""Test configuration: run everything on a virtual 8-device CPU mesh.

Real-TPU perf is covered by bench.py; correctness tests run on the CPU
backend so CI needs no TPU and multi-chip sharding can be validated with
``--xla_force_host_platform_device_count=8``.

Set ``BIBIM_TPU_TESTS=1`` to instead keep the real TPU backend: the tests
in test_tpu.py then exercise the compiled Pallas kernels against the XLA
fallback on actual hardware (everything else still passes — the pipeline
dispatches per-backend automatically).
"""

import os

_TPU_MODE = os.environ.get("BIBIM_TPU_TESTS", "") == "1"

if not _TPU_MODE:
    # Force-set: the environment may pin JAX_PLATFORMS to a hardware plugin
    # via sitecustomize, so setdefault is not enough.
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not _TPU_MODE:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables after each test module.

    The full suite compiles many hundreds of CPU executables in one
    process; past a volume threshold the XLA CPU compiler segfaults
    (deterministically, in backend_compile_and_load — every module
    passes in any subset run, only the whole-suite run crashes).
    Releasing executables module-by-module keeps the process under the
    threshold; modules recompile what they share, which costs seconds."""
    yield
    jax.clear_caches()
