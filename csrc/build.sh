#!/bin/sh
# Build the native mesh kernels shared library.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -std=c++17 mesh_kernels.cpp -o libmesh_kernels.so
echo "built $(pwd)/libmesh_kernels.so"
