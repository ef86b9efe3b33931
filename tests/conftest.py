"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding logic is validated without TPU hardware by forcing the
host CPU platform to present 8 devices (the pattern called out in SURVEY.md
§4). Note: the environment's TPU plugin overrides JAX_PLATFORMS
programmatically, so we must force the CPU platform via jax.config *after*
import — env vars alone are not enough here.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", "tests must run on CPU"
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"


# NOTE: whole-model CPU tests used to segfault nondeterministically. The
# root cause was NOT a jaxlib bug: jnp.asarray zero-copy aliases aligned
# numpy arrays on the CPU backend, so weights loaded as views into the
# checkpoint mmap became dangling pointers once the YalmFile was GC'd.
# load_weights/load_fast_weights now copy out of the mmap (models/weights.py),
# which eliminated the crashes; the per-test subprocess isolation that
# papered over them has been removed.
