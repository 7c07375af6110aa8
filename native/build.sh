#!/bin/bash
# Build the frtm_native host library (warp + jpeg/png data path).
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -std=c++17 \
    frtm_native.cpp -o libfrtm_native.so \
    -ljpeg -lpng -lpthread
echo "built $(pwd)/libfrtm_native.so"
