#!/bin/sh
# Build the native wav codec / threaded batch loader (csrc/wavio.cpp).
# The Python side (nelegan_tpu/data/wavio.py) also builds it on demand;
# this script exists for explicit/CI builds.
set -e
cd "$(dirname "$0")/.."
g++ -O2 -shared -fPIC -o csrc/libwavio.so csrc/wavio.cpp -lpthread
echo "built csrc/libwavio.so"
