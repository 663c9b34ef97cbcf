#!/usr/bin/env bash
# CI entry point: the whole correctness gate on a GPU/TPU-free machine.
# Tests run on a virtual 8-device CPU mesh (tests/plugin_cpu.py), the
# same code path as TPU minus the backend — the analog of the
# reference's cpu_cuda.t fake backend (SURVEY.md §4.4).
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== compile check (single-chip entry + 8-device dryrun) =="
JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python - <<'EOF'
import jax
import __graft_entry__ as g
fn, args = g.entry()
jax.jit(fn).lower(*args).compile()
print("entry() compiles")
g.dryrun_multichip(8)
EOF

echo "== unit + model tests =="
python -m pytest tests/ -q

echo "== wheel build =="
bash scripts/build_wheel.sh

echo "CI OK"
