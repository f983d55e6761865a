"""Lazy builder for the native C++ components.

Compiles a shared library with the host toolchain on first use and caches it
under ``native/_build/`` (keyed by source mtime). No packaging machinery — the
reference likewise ships no native code in-repo and leans on external compiled
deps (SURVEY.md §2.9); ours compile from source in seconds.
"""

from __future__ import annotations

import os
import subprocess
import sys
import threading
from pathlib import Path
from typing import Optional

_DIR = Path(__file__).parent
_BUILD = _DIR / "_build"
_LOCK = threading.Lock()


def build_library(name: str, source: str, extra_flags=()) -> Optional[Path]:
    """Compile ``native/<source>`` into a cached .so; returns None if no
    toolchain is available (callers fall back to pure Python)."""
    src = _DIR / source
    out = _BUILD / f"{name}.so"
    with _LOCK:
        if out.exists() and out.stat().st_mtime >= src.stat().st_mtime:
            return out
        _BUILD.mkdir(exist_ok=True)
        cxx = os.environ.get("CXX", "g++")
        cmd = [
            cxx,
            "-O2",
            "-std=c++17",
            "-shared",
            "-fPIC",
            str(src),
            "-o",
            str(out),
            *extra_flags,
        ]
        try:
            subprocess.run(
                cmd, check=True, capture_output=True, text=True, timeout=120
            )
        except (subprocess.CalledProcessError, FileNotFoundError, subprocess.TimeoutExpired) as e:
            msg = getattr(e, "stderr", str(e))
            print(f"[lit_llama_tpu.native] build of {name} failed: {msg}", file=sys.stderr)
            return None
        return out
