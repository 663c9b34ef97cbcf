#!/usr/bin/env bash
# Build the thallo-tpu wheel (offline: no build isolation, local
# setuptools) and smoke-test that it installs and imports.
set -euo pipefail
cd "$(dirname "$0")/.."

rm -rf dist
python -m pip wheel --no-deps --no-build-isolation -w dist . -q
WHEEL=$(ls dist/thallo_tpu-*.whl)
echo "built $WHEEL"

python - "$WHEEL" <<'EOF'
import subprocess, sys, tempfile, os
wheel = sys.argv[1]
with tempfile.TemporaryDirectory() as td:
    subprocess.check_call([sys.executable, "-m", "pip", "install", "-q",
                           "--no-deps", "--target", td, wheel])
    env = dict(os.environ, PYTHONPATH=td, JAX_PLATFORMS="cpu")
    out = subprocess.check_output(
        [sys.executable, "-c",
         "import thallo_tpu, thallo_tpu.models, thallo_tpu.cli; "
         "print('import ok,', len(thallo_tpu.models.REGISTRY), 'models')"],
        env=env, cwd=td)
    print(out.decode().strip())
EOF
