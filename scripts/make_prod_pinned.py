"""Regenerate tests/goldens/prod_geometry_pinned.json.

Run from the repo root after an INTENDED change to the production-shape
analysis chain (decoder defaults, cost, L-BFGS, cycler wiring):

    python scripts/make_prod_pinned.py

Forces CPU (the pinned numbers are the CPU-deterministic trajectory the
slow tier reproduces; TPU bf16 matmuls would not match).
"""

import json
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

from test_prod_geometry_pinned import ART, compute_summary  # noqa: E402

if __name__ == "__main__":
    summary = compute_summary()
    os.makedirs(os.path.dirname(ART), exist_ok=True)
    with open(ART, "w") as f:
        json.dump(summary, f, indent=1)
    small = {k: v for k, v in summary.items() if k != "inc_probe"}
    print(f"wrote {ART}: {small} (+{len(summary['inc_probe'])}-pt probe)")
