"""Test configuration.

All tests run on CPU with 8 virtual XLA devices so that multi-chip sharding
paths (mesh/pjit/shard_map) are exercised without TPU hardware, mirroring the
strategy in SURVEY.md section 4 item 4.  Must run before `import jax`.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# The environment's TPU plugin force-prepends itself to jax_platforms even
# when JAX_PLATFORMS=cpu is exported, so pin the config explicitly too.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
