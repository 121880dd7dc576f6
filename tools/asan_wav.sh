#!/bin/sh
# AddressSanitizer drive of the native WAV decode path (see the drive's
# docstring). detect_leaks=0: CPython intentionally leaks interpreter state
# at exit and drowns the report; ASan memory errors still abort.
set -e
cd "$(dirname "$0")/.."
g++ -O1 -std=c++17 -shared -fPIC -fsanitize=address -pthread \
    native/sgtpu.cpp -o /tmp/libsgtpu_asan.so
ASAN_OPTIONS=detect_leaks=0 \
LD_PRELOAD=$(gcc -print-file-name=libasan.so) \
    /opt/venv/bin/python tools/asan_wav_drive.py
