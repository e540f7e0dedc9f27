#!/usr/bin/env bash
# Build the native host-side ops (clustering) into a ctypes-loadable .so.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -std=c++17 cluster.cpp -o libponder_cluster.so
echo "built $(pwd)/libponder_cluster.so"
