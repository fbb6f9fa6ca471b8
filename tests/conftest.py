import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding logic is
# exercised without TPU hardware. Must be set before jax import.
# Force CPU even when the environment pins a TPU platform: this machine's
# sitecustomize registers the axon TPU plugin and pins
# jax.config jax_platforms="axon,cpu" at interpreter start, so the env var
# alone is not enough — update the config after import as well.  The suite
# needs the virtual 8-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Persistent compile cache: XLA-CPU compiles of the codec kernels take tens
# of seconds; cache them across pytest runs.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_ENABLE_XLA_CACHES", "all")

import pathlib

import jax
import pytest

jax.config.update("jax_platforms", "cpu")

DATA_DIR = pathlib.Path(__file__).parent / "data"


@pytest.fixture(scope="session")
def data_dir() -> pathlib.Path:
    return DATA_DIR


@pytest.fixture(scope="session")
def small_vcf() -> bytes:
    return (DATA_DIR / "small.vcf").read_bytes()


@pytest.fixture(scope="session")
def small_vcfc() -> bytes:
    return (DATA_DIR / "small.vcfc").read_bytes()


@pytest.fixture(scope="session")
def sv_vcf() -> bytes:
    return (DATA_DIR / "sv.vcf").read_bytes()


@pytest.fixture(scope="session")
def sv_vcfc() -> bytes:
    return (DATA_DIR / "sv.vcfc").read_bytes()
