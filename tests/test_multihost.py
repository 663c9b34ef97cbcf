"""Single-process coverage for parallel/multihost.py: the helpers must
behave correctly when the "job" is one process (the degenerate pod), so
their multi-host contract is at least exercised at N=1 — the reference
has no multi-node analog at all (SURVEY.md §5)."""
import os

import numpy as np
import jax

import thallo_tpu as tl
from thallo_tpu.parallel import multihost


def test_is_coordinator_single_process():
    assert jax.process_count() == 1
    assert multihost.is_coordinator() is True


def test_global_mesh_spans_all_devices():
    mesh = multihost.global_mesh(axis_names=("x",))
    assert mesh.devices.size == len(jax.devices())
    mesh2 = multihost.global_mesh(axis_names=("x", "y"))
    assert mesh2.devices.size == len(jax.devices())
    assert set(mesh2.axis_names) == {"x", "y"}


def test_checkpoint_per_host_writes_from_coordinator(tmp_path):
    src = """
W = Dims("W")
Inputs(X=Unknown(float, (W,), 0), A=Array(float, (W,), 1))
x = W()
r = Residuals(fit=X(x) - A(x))
"""
    spec = tl.load_energy(src)
    plan = spec.plan({"W": 8})
    rng = np.random.RandomState(0)
    plan.init({"X": rng.randn(8).astype(np.float32),
               "A": rng.randn(8).astype(np.float32)})
    path = str(tmp_path / "ckpt_{process}.npz")
    multihost.checkpoint_per_host(plan, path)
    written = path.format(process=jax.process_index())
    assert os.path.exists(written)
    # round-trips through load_state
    plan.run_steps(2)
    plan.load_state(written)
    assert plan._iter == 0


def test_two_process_sharded_solve():
    """REAL multi-process coverage: two jax.distributed processes (2 CPU
    devices each) run a GN solve sharded over the 4-device global mesh;
    the converged cost must match a single-process solve.  Exercises
    initialize(), global_mesh(), make_array_from_callback placement, and
    cross-process collectives (Gloo) end to end."""
    import socket
    import subprocess
    import sys as _sys

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    worker = os.path.join(os.path.dirname(__file__), "mh_worker.py")
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""   # keep the axon TPU plugin out
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    procs = [
        subprocess.Popen([_sys.executable, worker, str(i), str(port)],
                         env=env, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out)
    assert all(p.returncode == 0 for p in procs), "\n---\n".join(outs)
    assert any("sharded solve over 2 processes ok" in o for o in outs), outs
