"""Build the native drain extension in place:

    python -m tpu_plume.native.build

Uses setuptools + the system C++ toolchain; drops ``_drain*.so`` next to this
file.  The framework falls back to the NumPy drain when the module is absent.
"""

from __future__ import annotations

import os
import subprocess
import sys
import sysconfig

HERE = os.path.dirname(os.path.abspath(__file__))


def build(verbose: bool = False) -> str | None:
    src = os.path.join(HERE, "drain.cpp")
    include = sysconfig.get_paths()["include"]
    suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    out = os.path.join(HERE, f"_drain{suffix}")
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return out
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        f"-I{include}", src, "-o", out,
    ]
    try:
        res = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired) as e:
        if verbose:
            print(f"native build failed: {e}", file=sys.stderr)
        return None
    if res.returncode != 0:
        if verbose:
            print(res.stderr, file=sys.stderr)
        return None
    return out


if __name__ == "__main__":
    path = build(verbose=True)
    if path is None:
        sys.exit("native build failed")
    print(f"built {path}")
