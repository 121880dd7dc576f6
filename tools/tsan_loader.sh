#!/bin/sh
# ThreadSanitizer drive of the native batch loader's concurrency surface:
# 4 decode workers x 2 concurrent zero-copy consumers (sg_loader_acquire/
# release), 3 trials, every-file-exactly-once assertion.
#
# The TSan runtime cannot be dlopen'd into a running CPython (static TLS
# exhaustion) — LD_PRELOAD it instead. Last clean run: round 3 (0 warnings).
set -e
cd "$(dirname "$0")/.."
g++ -O1 -std=c++17 -shared -fPIC -fsanitize=thread -pthread \
    native/sgtpu.cpp -o /tmp/libsgtpu_tsan.so
LD_PRELOAD=$(gcc -print-file-name=libtsan.so.2) \
    /opt/venv/bin/python tools/tsan_loader_drive.py
