"""Typed CLI generation from a function signature (replaces jsonargparse).

The reference wraps every workload ``main()`` with ``jsonargparse.CLI``
(reference: generate.py:158-172); that package isn't part of this stack, so this
module builds the same UX from the standard library: one flag per keyword
parameter, types from annotations, defaults from the signature, help text parsed
from the docstring's ``Args:`` section.
"""

from __future__ import annotations

import argparse
import inspect
import re
import sys
import typing
from pathlib import Path
from typing import Callable, Optional


def _docstring_arg_help(fn: Callable) -> dict:
    doc = inspect.getdoc(fn) or ""
    helps = {}
    in_args = False
    current = None
    for line in doc.splitlines():
        stripped = line.strip()
        if stripped.lower() in ("args:", "arguments:"):
            in_args = True
            continue
        if in_args:
            m = re.match(r"^(\w+)\s*(?:\([^)]*\))?\s*:\s*(.*)$", stripped)
            if m:
                current = m.group(1)
                helps[current] = m.group(2)
            elif stripped and current:
                helps[current] += " " + stripped
            elif not stripped:
                current = None
    return helps


def _unwrap_optional(tp):
    origin = typing.get_origin(tp)
    if origin is typing.Union:
        args = [a for a in typing.get_args(tp) if a is not type(None)]
        if len(args) == 1:
            return args[0], True
    return tp, False


def _parse_bool(s: str) -> bool:
    if s.lower() in ("true", "1", "yes"):
        return True
    if s.lower() in ("false", "0", "no"):
        return False
    raise argparse.ArgumentTypeError(f"expected a boolean, got {s!r}")


def _apply_platform_override() -> None:
    """Honor LIT_LLAMA_TPU_PLATFORM=cpu|tpu for workload CLIs.

    This image's sitecustomize pre-imports jax pinned to the TPU plugin, so
    JAX_PLATFORMS set by the user is ignored; the config knob still works until
    the first backend initialization."""
    import os

    plat = os.environ.get("LIT_LLAMA_TPU_PLATFORM")
    if plat:
        try:
            import jax

            jax.config.update("jax_platforms", plat)
        except Exception:
            pass
    enable_compilation_cache()


def enable_compilation_cache() -> None:
    """Persist XLA compilations across processes (cold 7B compiles take tens of
    seconds to minutes through the remote-compile service; a second run of the
    same CLI should skip them entirely). Opt out / relocate with
    LIT_LLAMA_TPU_COMPILE_CACHE=off|<dir>."""
    import os

    knob = os.environ.get("LIT_LLAMA_TPU_COMPILE_CACHE", "")
    if knob.lower() in ("off", "0", "none"):
        return
    cache_dir = knob or os.path.expanduser("~/.cache/lit_llama_tpu/xla")
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache everything that took XLA >1s to build, however small the graph
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass


def cli(fn: Callable, args: Optional[list] = None):
    """Parse argv according to ``fn``'s signature and call it."""
    _apply_platform_override()
    sig = inspect.signature(fn)
    try:
        # resolve string annotations (modules using `from __future__ import
        # annotations` otherwise hand argparse the literal string "int")
        import typing

        hints = typing.get_type_hints(fn)
    except Exception:
        hints = {}
    helps = _docstring_arg_help(fn)
    doc = (inspect.getdoc(fn) or "").split("\n\n")[0]
    parser = argparse.ArgumentParser(
        description=doc, formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    for name, param in sig.parameters.items():
        tp = param.annotation if param.annotation is not inspect.Parameter.empty else str
        tp = hints.get(name, tp)
        tp, _ = _unwrap_optional(tp)
        kwargs = dict(help=helps.get(name, ""))
        if tp is bool:
            kwargs["type"] = _parse_bool
        elif tp in (int, float, str, Path):
            kwargs["type"] = tp
        else:
            kwargs["type"] = str
        if param.default is not inspect.Parameter.empty:
            kwargs["default"] = param.default
        else:
            kwargs["required"] = True
        parser.add_argument(f"--{name}", **kwargs)
    ns = parser.parse_args(args)
    return fn(**vars(ns))
