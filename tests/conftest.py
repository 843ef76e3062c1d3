"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

The reference has no test suite (SURVEY.md §4); we substitute the missing
distributed fixtures with an 8-device CPU host platform so every sharding
test exercises real collectives without TPU hardware.

Must run before jax is imported anywhere.
"""

import os

# The session may point JAX at real TPU hardware (JAX_PLATFORMS=axon, forced
# by a sitecustomize that also overrides jax.config at import); tests always
# run on the virtual CPU mesh unless explicitly opted out, so the config must
# be updated *after* import too.
if not os.environ.get("SPEECHLID_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Keep compile times sane for the test matrix.
os.environ.setdefault("JAX_ENABLE_X64", "0")

if not os.environ.get("SPEECHLID_TEST_TPU"):
    import jax

    jax.config.update("jax_platforms", "cpu")
    assert jax.devices()[0].platform == "cpu", jax.devices()

# Persistent XLA compilation cache: the suite's wall time on this 1-CPU box
# is dominated by compiles of stable tiny graphs, so warm reruns (the
# iteration gate) drop far below the cold time.  Keyed by backend+config —
# safe to share the production cache dir.
from speechlid_tpu.core.compile_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()


# ---------------------------------------------------------------------------
# slow-test gate: heavyweight compile/e2e tests are skipped by default so the
# suite stays a usable iteration gate on this 1-CPU box; `--runslow` is the
# full gate (zero coverage loss).  Every component keeps at least one fast
# representative in the default run.
# ---------------------------------------------------------------------------

import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="also run tests marked slow (the full gate)",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: heavyweight compile/e2e test, run with --runslow"
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow: run with --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
