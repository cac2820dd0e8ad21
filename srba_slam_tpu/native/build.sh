#!/bin/sh
# Build the native frame loader shared library next to this script.
set -e
cd "$(dirname "$0")"
g++ -O3 -std=c++17 -fPIC -shared frameloader.cpp \
    -lpng -lz -pthread -o libframeloader.so
echo "built $(pwd)/libframeloader.so"
