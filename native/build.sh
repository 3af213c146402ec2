#!/bin/sh
# Build the native graph-preprocessing shared library into the package.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -std=c++17 \
    -o ../networks_fenicsx_tpu/_native/libnetgraph.so netgraph.cpp
echo "built networks_fenicsx_tpu/_native/libnetgraph.so"
