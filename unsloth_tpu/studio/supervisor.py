"""Native supervisor glue: build csrc/supervisor.cpp on demand and run
the studio backend under it (reference: studio/src-tauri/ — the Tauri
shell owns the backend process: spawn/reap, preflight, crash restart,
clean shutdown; SURVEY 2k.5 maps that to C++ in this image)."""

from __future__ import annotations

import os
import subprocess
import sys
from typing import List, Optional


def supervisor_binary() -> Optional[str]:
    """Path to the built ``unsloth-supervisor`` (compiling if stale),
    or None when no C++ toolchain is available."""
    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    src = os.path.join(root, "csrc", "supervisor.cpp")
    out = os.path.join(root, "csrc", "unsloth-supervisor")
    try:
        if (not os.path.exists(out)
                or os.path.getmtime(out) < os.path.getmtime(src)):
            subprocess.run(["g++", "-O3", "-o", out, src], check=True,
                           capture_output=True)
        return out
    except (OSError, subprocess.CalledProcessError):
        return None


def run_supervised(port: int, workdir: str, extra_args: List[str],
                   max_restarts: int = 5,
                   exec_: bool = True) -> Optional[subprocess.Popen]:
    """Run ``python -m unsloth_tpu.cli studio ...`` under the native
    supervisor. With ``exec_`` the current process becomes the
    supervisor (CLI path); otherwise returns the Popen (tests)."""
    binary = supervisor_binary()
    argv = [binary or "", "--port", str(port),
            "--max-restarts", str(max_restarts),
            "--pidfile", os.path.join(workdir, "studio.pid"),
            "--log", os.path.join(workdir, "supervisor.log"),
            "--", sys.executable, "-m", "unsloth_tpu.cli", "studio",
            "--port", str(port), "--workdir", workdir] + extra_args
    if binary is None:
        raise RuntimeError("no g++ toolchain: run without --supervised")
    os.makedirs(workdir, exist_ok=True)
    if exec_:
        os.execv(binary, argv)
    return subprocess.Popen(argv)
