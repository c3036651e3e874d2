#!/bin/sh
# Build the native RLE ops shared library.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -o librle_ops.so rle_ops.cpp
echo "built $(pwd)/librle_ops.so"
