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


# ---------------------------------------------------------------------------
# Subprocess isolation for tests that trip jaxlib 0.9.0's CPU-backend bug
# ---------------------------------------------------------------------------
#
# Executing moderately complex jitted decode programs on the CPU backend
# corrupts the heap nondeterministically (jaxlib 0.9.0; crash sites vary
# between XLA execution and unrelated trace-time code — upstream bug, not a
# yalm_tpu defect). Affected whole-model tests run in a child pytest process:
# a segfault (signal exit) is retried a few times, while a genuine test
# failure (exit 1) still fails immediately. See memory note tpu-env-quirks.

import functools
import subprocess
import sys

_ISOLATION_ENV = "YALM_TEST_ISOLATED"


def isolated(fn):
    """Run this test in its own pytest subprocess, retrying segfaults only."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        if os.environ.get(_ISOLATION_ENV):
            return fn(*args, **kwargs)
        nodeid = f"{fn.__module__.replace('.', '/')}.py::{fn.__name__}"
        env = dict(os.environ, **{_ISOLATION_ENV: "1"})
        for attempt in range(4):
            r = subprocess.run(
                [sys.executable, "-m", "pytest", "-q", "-x", "--no-header",
                 os.path.join(os.path.dirname(__file__), nodeid.split("/")[-1])],
                env=env, capture_output=True, text=True,
                cwd=os.path.dirname(os.path.dirname(__file__)))
            if r.returncode == 0:
                return
            # retry ONLY on signal exits (segfault/abort); anything else —
            # test failure (1), collection error (2), usage (4), no tests
            # (5) — is a real problem to surface immediately with output
            if not (r.returncode < 0 or r.returncode in (134, 139)):
                raise AssertionError(
                    f"{nodeid} failed in subprocess (exit {r.returncode}):\n"
                    f"{r.stdout[-4000:]}\n{r.stderr[-2000:]}")
        raise AssertionError(f"{nodeid} crashed (signal) in 4/4 subprocess attempts")

    return wrapper
