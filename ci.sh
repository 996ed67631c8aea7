#!/usr/bin/env bash
# CI smoke — the analog of the reference's workflow
# (/root/reference/.github/workflows/rust.yml:24-33): build, unit tests,
# then the golden end-to-end CLI run (`cargo run tests/config.json`) and
# a flags run with --annotate-matches --write-pin.
#
# Usage: ./ci.sh [quick]
#   quick  — skip the full pytest suite, run only the golden e2e tests.
set -euo pipefail
cd "$(dirname "$0")"

export JAX_PLATFORMS="${JAX_PLATFORMS:-cpu}"
export SAGE_TPU_MESH="${SAGE_TPU_MESH:-1,1}"

echo "== sage-tpu CI smoke =="
python -c "import sage_tpu; print('import ok, version', sage_tpu.__version__)"

# native helpers compile from source on first use; force it now so a
# toolchain problem fails fast
python -c "import sage_tpu.native as n; n.ensure_built(); print('native ok')"

if [ "${1:-}" = "quick" ]; then
    python -m pytest tests/test_cli.py tests/test_search_golden.py -x -q
else
    python -m pytest tests/ -x -q
fi

echo "== CI smoke passed =="
