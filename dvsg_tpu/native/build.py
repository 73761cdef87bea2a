"""Build the `_dvsg_native` C++ extension in-tree (no network, no pip).

Invoked lazily by dvsg_tpu.utils.staging on first use, or explicitly:
    python -m dvsg_tpu.native.build
"""

from __future__ import annotations

import os
import subprocess
import sysconfig

_HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(_HERE, "staging.cpp")


def ext_path() -> str:
    suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    return os.path.join(_HERE, f"_dvsg_native{suffix}")


def build(verbose: bool = False) -> str:
    """Compile the extension if the source is newer than the binary."""
    out = ext_path()
    if (os.path.exists(out)
            and os.path.getmtime(out) >= os.path.getmtime(SRC)):
        return out
    include = sysconfig.get_path("include")
    cmd = [
        os.environ.get("CXX", "g++"),
        "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        "-pthread",
        f"-I{include}",
        SRC, "-o", out,
    ]
    res = subprocess.run(cmd, capture_output=True, text=True)
    if res.returncode != 0:
        raise RuntimeError(
            f"native build failed:\n{' '.join(cmd)}\n{res.stderr}")
    if verbose:
        print(f"built {out}")
    return out


if __name__ == "__main__":
    build(verbose=True)
