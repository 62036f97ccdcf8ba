"""Test configuration.

Per SURVEY.md §4: the reference never tests its TPU path; we improve on that by
running every test on a virtual 8-device CPU mesh so multi-chip sharding code is
exercised in CI without TPU hardware. Env vars must be set before jax initializes.
"""

import os

# force the CPU backend regardless of the ambient platform (the driver environment
# presets JAX_PLATFORMS=axon/tpu and preloads jax at interpreter startup, so plain
# env vars are too late — use jax.config.update before any backend is initialized);
# tests must run on the virtual 8-device mesh
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (xla_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("CAPREOLUS_OFFLINE", "1")
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import jax

if os.environ.get("CAPREOLUS_TEST_TPU", "") != "1":
    jax.config.update("jax_platforms", "cpu")
# persistent XLA compilation cache: repeated test runs skip recompiles
jax.config.update("jax_compilation_cache_dir", "/tmp/capreolus_tpu_jax_cache")

import pytest


@pytest.fixture
def tmpdir_as_cache(tmp_path, monkeypatch):
    """Point cache and results base paths at a tmpdir (parity with the reference's
    tmpdir_as_cache fixture, /root/reference/capreolus/tests/common_fixtures.py:9-18)."""
    from capreolus_tpu.core import constants

    monkeypatch.setitem(constants, "CACHE_BASE_PATH", tmp_path / "cache")
    monkeypatch.setitem(constants, "RESULTS_BASE_PATH", tmp_path / "results")
    return tmp_path


def pytest_addoption(parser):
    parser.addoption("--check-download", action="store_true", default=False, help="run download-marked tests")


def pytest_configure(config):
    config.addinivalue_line("markers", "download: requires network downloads")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--check-download"):
        return
    skip = pytest.mark.skip(reason="needs --check-download")
    for item in items:
        if "download" in item.keywords:
            item.add_marker(skip)
