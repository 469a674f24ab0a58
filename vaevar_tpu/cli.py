"""Console entry points (pyproject [project.scripts]).

The CLIs live as repo-root scripts (`run_da.py`, `run_train_vae.py`,
`run_train_forecast.py`, `scripts/convert_ckpt.py`) so they stay runnable
straight from a checkout, the way the reference's `da_4dvar.py` /
`train_vae.py` are (SURVEY.md §1 L6). An installed wheel also ships them
(pyproject `py-modules` / package-dir), and these wrappers are the stable
import surface either way: each resolves the script module from the
installed top level first, then from a source checkout next to this
package.
"""

from __future__ import annotations

import importlib
import os
import sys


def _load(name: str, *search_subdirs: str):
    try:
        return importlib.import_module(name)
    except ImportError:
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        for sub in ("",) + search_subdirs:
            cand = os.path.join(root, sub) if sub else root
            if os.path.exists(os.path.join(cand, name + ".py")):
                if cand not in sys.path:
                    sys.path.insert(0, cand)
                return importlib.import_module(name)
        raise


def da_main():
    _load("run_da").main()


def train_vae_main():
    _load("run_train_vae").main()


def train_forecast_main():
    _load("run_train_forecast").main()


def convert_ckpt_main():
    _load("convert_ckpt", "scripts").main()
