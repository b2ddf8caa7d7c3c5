#!/usr/bin/env python
"""Build the native runtime library (g++ → libdfx_native.so).

`--asan` builds libdfx_native_asan.so with AddressSanitizer — the analogue of
the reference's dedicated Clang-ASAN CI job (.github/workflows/
build-linux.yml:55-59); tests/test_native_asan.py runs the native test
surface against it in a subprocess with ASAN preloaded.
"""
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
SRCS = [os.path.join(HERE, "src", "dfx_native.cpp"),
        os.path.join(HERE, "src", "radient_c.cpp")]
OUT = os.path.join(HERE, "libdfx_native.so")
OUT_ASAN = os.path.join(HERE, "libdfx_native_asan.so")


def build(force: bool = False, asan: bool = False) -> str:
    out = OUT_ASAN if asan else OUT
    if (not force and os.path.exists(out)
            and all(os.path.getmtime(out) >= os.path.getmtime(s)
                    for s in SRCS)):
        return out
    cmd = ["g++", "-std=c++17", "-shared", "-fPIC", "-o", out]
    if asan:
        cmd += ["-O1", "-g", "-fsanitize=address", "-fno-omit-frame-pointer"]
    else:
        cmd += ["-O3"]
    subprocess.run(cmd + SRCS, check=True)
    return out


if __name__ == "__main__":
    print(build(force="--force" in sys.argv, asan="--asan" in sys.argv))
