"""Pallas TPU flash attention for the full-grid LG stage (placeholder gate).

Round-1 scaffolding: `available()` returns False until the kernel lands, so
callers fall back to the pure-JAX online-softmax path in ops/attention.py.
"""

from __future__ import annotations


def available() -> bool:
    return False


def flash_attention(q, k, v):  # pragma: no cover - enabled with the kernel
    raise NotImplementedError
