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
