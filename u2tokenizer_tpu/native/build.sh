#!/bin/sh
# Build the native ingest library. Produces libu2native.so next to this file.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -std=c++17 \
    nifti_loader.cpp -o libu2native.so -lz
echo "built $(pwd)/libu2native.so"
