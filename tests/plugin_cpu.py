"""Early pytest plugin (loaded via -p, before output capture starts):
re-exec pytest with a scrubbed environment so tests run on a virtual
8-device CPU mesh.

Why exec: this environment's sitecustomize registers the axon TPU backend
at interpreter startup, before pytest ever runs, so setting JAX_PLATFORMS
in a conftest is too late.  Why here and not conftest.py: conftest loads
after pytest's fd-capture has replaced stdout, so an exec from there loses
all output; -p plugins import before capture starts.
"""
import os
import sys

if os.environ.get("THALLO_TESTS_REEXEC") != "1":
    env = dict(os.environ)
    env["THALLO_TESTS_REEXEC"] = "1"
    env["PALLAS_AXON_POOL_IPS"] = ""  # stop sitecustomize registering axon
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    os.execvpe(
        sys.executable,
        [sys.executable, "-m", "pytest"] + sys.argv[1:],
        env,
    )
