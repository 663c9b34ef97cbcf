"""C API integration: build the native library + smoke tests with make
and run them (the reference's tests/minimal build-against-libThalloDev
pattern, make_template.inc).  Skipped when the toolchain is missing."""
import os
import shutil
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CAPI = os.path.join(REPO, "capi")

toolchain = shutil.which("g++") and shutil.which("make")


@pytest.mark.skipif(not toolchain, reason="needs g++ + make")
def test_capi_build_and_run():
    env = dict(os.environ)
    # the embedded interpreter must find thallo_tpu
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run(["make", "-s"], cwd=CAPI, env=env, capture_output=True, text=True)
    assert r.returncode == 0, r.stderr[-2000:]
    for exe in ["bin/test_minimal", "bin/test_cpp_solver", "bin/test_bal_solver"]:
        r = subprocess.run(
            [os.path.join(CAPI, exe)], cwd=CAPI, env=env,
            capture_output=True, text=True, timeout=600,
        )
        assert r.returncode == 0, (exe, r.stdout[-1000:], r.stderr[-1000:])
        assert "PASS" in r.stdout, (exe, r.stdout[-500:])


@pytest.mark.skipif(not toolchain, reason="needs g++ + make")
def test_capi_plan_options_env():
    """THALLO_TPU_PLAN_OPTIONS (JSON) reaches the embedded planner: the
    native BAL solver runs under linear_solver=schur_pcg (the reference's
    fixed-ABI init-params struct can't carry new knobs, Thallo.h:10-36)."""
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["THALLO_TPU_PLAN_OPTIONS"] = '{"linear_solver": "schur_pcg"}'
    r = subprocess.run(["make", "-s"], cwd=CAPI, env=env, capture_output=True, text=True)
    assert r.returncode == 0, r.stderr[-2000:]
    r = subprocess.run(
        [os.path.join(CAPI, "bin/test_bal_solver")], cwd=CAPI, env=env,
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, (r.stdout[-1000:], r.stderr[-1000:])
    assert "PASS" in r.stdout, r.stdout[-500:]
