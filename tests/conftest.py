"""Test configuration: tests run on a virtual 8-device CPU mesh so
sharding paths are exercised without TPU hardware (the analog of the
reference's CPU shim backend, /root/reference/API/src/cpu_cuda.t).  The
CPU re-exec itself lives in plugin_cpu.py (see pyproject addopts)."""
import jax

# oracle computations (jacfwd of matmuls) must not be bf16-truncated
jax.config.update("jax_default_matmul_precision", "highest")
