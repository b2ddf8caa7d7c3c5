#!/usr/bin/env python
"""Build the native runtime library (g++ → libdfx_native.so)."""
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
SRCS = [os.path.join(HERE, "src", "dfx_native.cpp"),
        os.path.join(HERE, "src", "radient_c.cpp")]
OUT = os.path.join(HERE, "libdfx_native.so")


def build(force: bool = False) -> str:
    if (not force and os.path.exists(OUT)
            and all(os.path.getmtime(OUT) >= os.path.getmtime(s)
                    for s in SRCS)):
        return OUT
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
           "-o", OUT] + SRCS
    subprocess.run(cmd, check=True)
    return OUT


if __name__ == "__main__":
    print(build(force="--force" in sys.argv))
