"""Test configuration: CPU backend with a virtual 8-device mesh, f64 enabled.

Two jobs, both of which must happen before jax initializes:

1. **Escape the axon remote-compile hook.** This image boots every python
   process with a sitecustomize (via PYTHONPATH=/root/.axon_site) that
   registers the axon TPU PJRT plugin with remote compilation — which also
   routes *CPU* XLA compiles through the relay, making eager/compiled tests
   ~15x slower. Since sitecustomize has already run by the time pytest loads
   this conftest, we re-exec the interpreter once with a cleaned environment.

2. **CPU x64 + 8 virtual devices.** The reference engine is f64 by default
   (rt-config.h:42); x64 gives numerical parity. Multi-chip sharding tests
   run on 8 virtual CPU devices via --xla_force_host_platform_device_count.
"""

import os
import sys

_SENTINEL = "SRKTPU_TEST_REEXEC"


def _needs_reexec() -> bool:
    if os.environ.get(_SENTINEL):
        return False
    # note: sitecustomize itself imports jax, so jax is always in sys.modules
    # by now — harmless, since the re-exec'd child starts a fresh interpreter.
    return "/root/.axon_site" in os.environ.get("PYTHONPATH", "")


def pytest_configure(config):
    if not _needs_reexec():
        return
    # pytest's fd-level capture is already active here; stop it so the
    # re-exec'd interpreter inherits the real stdout/stderr.
    capman = config.pluginmanager.get_plugin("capturemanager")
    if capman is not None:
        try:
            capman.stop_global_capturing()
        except Exception:
            pass
    env = dict(os.environ)
    env[_SENTINEL] = "1"
    env["PYTHONPATH"] = ":".join(
        p for p in env.get("PYTHONPATH", "").split(":") if p and "axon_site" not in p
    )
    env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    env["JAX_PLATFORMS"] = "cpu"
    os.execve(sys.executable, [sys.executable, "-m", "pytest", *sys.argv[1:]], env)


os.environ.setdefault("JAX_PLATFORMS", "cpu")
_prev = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _prev:
    os.environ["XLA_FLAGS"] = (_prev + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(20260817)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
