"""Test bootstrap: run the suite on a virtual 8-device CPU mesh.

The ambient environment registers a tunneled-TPU PJRT plugin in every Python
process (sitecustomize on PYTHONPATH) and pins JAX_PLATFORMS to it; merely
importing jax then blocks for minutes while the plugin claims the remote
chip. Unit tests must run on CPU, so if we detect that environment (and jax
has not been imported yet) we re-exec the interpreter once with a cleaned
environment: no sitecustomize, JAX_PLATFORMS=cpu, and 8 virtual CPU devices
for sharding tests.
"""

import os
import sys

_MARK = "_TPU_OD_TESTS_REEXECED"


def _needs_reexec() -> bool:
    if os.environ.get(_MARK):
        return False
    return "axon" in os.environ.get("PYTHONPATH", "") or os.environ.get(
        "JAX_PLATFORMS", ""
    ) not in ("", "cpu")


if _needs_reexec():
    import subprocess

    env = dict(os.environ)
    env[_MARK] = "1"
    env["PYTHONPATH"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    if "xla_cpu_collective_call_terminate_timeout_seconds" not in env["XLA_FLAGS"]:
        # 8 virtual devices on few cores: a starved participant thread must
        # not trip XLA:CPU's 40s rendezvous termination (SIGABRT)
        env["XLA_FLAGS"] += (
            " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
            " --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
        )
    # persistent XLA compile cache: the suite is compile-dominated on this
    # 1-core host (cold ~39 min); warm reruns skip every >1s compile
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cpu_test_cache")
    # subprocess (not execve): pytest's output capture machinery loses the
    # terminal across an exec, swallowing the report entirely.
    ret = subprocess.run(
        [sys.executable, "-m", "pytest", *sys.argv[1:]], env=env
    ).returncode
    os._exit(ret)

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
if "xla_cpu_collective_call_terminate_timeout_seconds" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += (
        " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
        " --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
    )
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cpu_test_cache")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
