#!/bin/sh
# Build the native data-pipeline library.
set -e
cd "$(dirname "$0")"
g++ -O3 -shared -fPIC -std=c++17 -o libfastpair.so fastpair.cpp -pthread
echo "built $(pwd)/libfastpair.so"
