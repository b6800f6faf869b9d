#!/bin/sh
# Build libwmd_native.so (ctypes-consumed C ABI; no pybind11 needed).
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -std=c++17 \
    -I/usr/include/opencv4 \
    wmd_native.cpp \
    -lopencv_imgcodecs -lopencv_imgproc -lopencv_core -lpthread \
    -o libwmd_native.so
echo "built $(pwd)/libwmd_native.so"
