#!/bin/bash
# Build the native host-side libraries (ctypes-loaded).
set -e
SRC_DIR=$(dirname "$0")/../xlayer_prover_tpu/native
g++ -O3 -march=native -shared -fPIC -o "$SRC_DIR/libzkcrypto.so" "$SRC_DIR/zkcrypto.cpp"
g++ -O3 -march=native -shared -fPIC -o "$SRC_DIR/libnexec.so" "$SRC_DIR/nexec.cpp"
g++ -O3 -march=native -shared -fPIC -o "$SRC_DIR/libmsm.so" "$SRC_DIR/msm.cpp"
g++ -O3 -march=native -fopenmp -shared -fPIC -o "$SRC_DIR/libposbn.so" "$SRC_DIR/posbn.cpp"
echo "built $SRC_DIR/libzkcrypto.so $SRC_DIR/libnexec.so $SRC_DIR/libmsm.so"
