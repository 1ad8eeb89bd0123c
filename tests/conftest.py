"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Multi-chip sharding is validated on host CPU devices
(xla_force_host_platform_device_count); the real TPU is only used by
bench.py and explicit on-device scripts, never by unit tests.
"""

import os

# The harness environment pins JAX_PLATFORMS=axon (remote TPU tunnel) via
# sitecustomize, which silently wins over env vars set here — the only
# reliable override is jax.config.update after import.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def quran_db():
    from tilawa_tpu.data.quran import QuranDB

    return QuranDB()


@pytest.fixture(scope="session")
def tokenizer():
    from tilawa_tpu.data.tokenizer import SentencePieceBPE

    return SentencePieceBPE.load_default()
