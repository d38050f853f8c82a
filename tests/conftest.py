"""Test fixtures: force an 8-device virtual CPU platform so multi-device
sharding paths are exercised without TPU hardware (SURVEY.md §4).

The ambient environment routes JAX through an `axon` TPU tunnel
(JAX_PLATFORMS=axon + a sitecustomize on PYTHONPATH that monkeypatches JAX's
backend selection at interpreter startup). Under it, every XLA compile is a
multi-second remote round-trip and --xla_force_host_platform_device_count is
defeated — unusable for a unit-test suite. Those hooks install before any
test code runs, so the suite re-launches itself once in a scrubbed
environment (plain 8-device CPU JAX) and reports the child's outcome.
"""

import os
import subprocess
import sys

import pytest


def _scrubbed_env():
    env = dict(os.environ)
    env["SCENEVERSE_TEST_REEXEC"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    )
    env["PYTHONPATH"] = ":".join(
        p for p in env.get("PYTHONPATH", "").split(":") if "axon" not in p
    )
    for k in list(env):
        if k.startswith(("PALLAS_AXON", "AXON", "TPU_")):
            env.pop(k)
    return env


def pytest_configure(config):
    if os.environ.get("SCENEVERSE_TEST_REEXEC") == "1":
        import jax

        jax.config.update("jax_enable_x64", False)
        return
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        capman.suspend_global_capture(in_=True)
    argv = [sys.executable, "-m", "pytest", *config.invocation_params.args]
    rc = subprocess.call(argv, env=_scrubbed_env())
    pytest.exit(f"re-ran under scrubbed CPU env (rc={rc})", returncode=rc)
