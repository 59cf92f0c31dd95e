#!/bin/bash
# Build the native imresize extension into the package.
set -e
cd "$(dirname "$0")/.."
EXT_SUFFIX=$(python -c 'import sysconfig; print(sysconfig.get_config_var("EXT_SUFFIX"))')
INCLUDE=$(python -c 'import sysconfig; print(sysconfig.get_paths()["include"])')
g++ -O3 -march=native -shared -fPIC -std=c++17 -I"$INCLUDE" \
    native/imresize_ext.cpp \
    -o "hsi_dmgasr_tpu/data/_imresize_native${EXT_SUFFIX}"
echo "built hsi_dmgasr_tpu/data/_imresize_native${EXT_SUFFIX}"
