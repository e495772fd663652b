"""Build the native host runtime: python -m geoa3_tpu.native.build"""

from __future__ import annotations

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(HERE, "geoa3_native.cpp")
OUT = os.path.join(HERE, "libgeoa3_native.so")


def build(verbose: bool = True) -> str:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC",
        "-std=c++17", SRC, "-o", OUT,
    ]
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    return OUT


if __name__ == "__main__":
    path = build()
    print(f"built {path}")
    sys.exit(0)
