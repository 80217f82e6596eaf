#!/usr/bin/env bash
# Build the native C++ audio loader into the package.
set -euo pipefail
cd "$(dirname "$0")/../native"
make
echo "Built: $(ls -la ../conette_tpu/native/libconette_audio.so)"
