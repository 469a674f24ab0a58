"""Persistent XLA compilation cache setup.

The DA cycler's jitted cost/solver graphs take minutes to compile at
production shapes; a fresh process (cycle resume after preemption — the
reference's SLURM `--quotatype=auto` workflow, da_4dvar_script.sh:14)
would otherwise pay that again. One call makes recompiles ~free across
process restarts.
"""

from __future__ import annotations

import os

DEFAULT_DIR = os.path.expanduser("~/.cache/vaevar_tpu_xla")


def enable(cache_dir: str | None = None) -> str:
    import jax

    d = cache_dir or os.environ.get("VAEVAR_COMPILE_CACHE", DEFAULT_DIR)
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return d
