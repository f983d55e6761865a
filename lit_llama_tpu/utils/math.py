"""Small numeric helpers shared across the framework.

Capability parity: `find_multiple` mirrors the rounding helper the reference uses for
vocab padding and SwiGLU hidden sizing (reference: lit_llama/utils.py:38-41).
"""

from __future__ import annotations


def find_multiple(n: int, k: int) -> int:
    """Round ``n`` up to the nearest multiple of ``k``.

    Used for vocab padding (multiple of 64 keeps the embedding/ lm_head matmuls
    MXU-tileable) and the SwiGLU hidden dimension (multiple of 256).
    """
    if n % k == 0:
        return n
    return n + k - (n % k)


def cdiv(a: int, b: int) -> int:
    """Ceiling division."""
    return -(-a // b)
