#!/usr/bin/env bash
# Development environment setup (analogue of the reference's scripts/setup.sh).
set -euo pipefail

PYTHON="${PYTHON:-python3}"

$PYTHON -m pip install --upgrade pip
# TPU VM: jax[tpu]; elsewhere: jax[cpu]
if [[ "${ACCEL:-tpu}" == "tpu" ]]; then
  $PYTHON -m pip install "jax[tpu]" \
    -f https://storage.googleapis.com/jax-releases/libtpu_releases.html
else
  $PYTHON -m pip install "jax[cpu]"
fi
$PYTHON -m pip install numpy scipy websockets websocket-client aiohttp \
  prometheus_client optax orbax-checkpoint safetensors tokenizers pytest
$PYTHON -m pip install -e . --no-deps

# optional native host kernels (FLAC decode, PCM conversion)
if command -v g++ >/dev/null; then
  make native || echo "native build failed; pure-Python fallbacks active"
fi

echo "done. run tests: python -m pytest tests/ -q"
