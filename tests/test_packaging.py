"""Packaging surface: pyproject metadata and the console entry wrappers.

The reference ships no packaging (SURVEY.md §0 — research scripts only);
this framework is pip-installable (`pip install -e . --no-deps
--no-build-isolation`) with console scripts wrapping the repo-root CLIs.
"""

import os
import subprocess
import sys
import tomllib

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestPyproject:
    def test_metadata_parses_and_targets_exist(self):
        with open(os.path.join(ROOT, "pyproject.toml"), "rb") as f:
            meta = tomllib.load(f)
        assert meta["project"]["name"] == "vaevar-tpu"
        from vaevar_tpu import cli

        for target in meta["project"]["scripts"].values():
            mod, fn = target.split(":")
            assert mod == "vaevar_tpu.cli"
            assert callable(getattr(cli, fn))

    def test_package_discovery_covers_source_tree(self):
        from setuptools import find_packages

        found = set(find_packages(where=ROOT, include=["vaevar_tpu*"]))
        on_disk = {
            "vaevar_tpu." + d
            for d in os.listdir(os.path.join(ROOT, "vaevar_tpu"))
            if os.path.isdir(os.path.join(ROOT, "vaevar_tpu", d))
            and d != "__pycache__"
        }
        assert on_disk <= found

    @pytest.mark.parametrize(
        "fn", ["da_main", "train_vae_main", "train_forecast_main",
               "convert_ckpt_main"]
    )
    def test_entry_points_parse_help(self, fn):
        # each wrapper must resolve its script module and reach argparse
        # (--help exits 0) in a clean interpreter
        code = (
            "import sys; sys.argv=['x','--help']\n"
            "import jax; jax.config.update('jax_platforms','cpu')\n"
            f"from vaevar_tpu.cli import {fn}\n"
            "try:\n"
            f"    {fn}()\n"
            "except SystemExit as e:\n"
            "    raise SystemExit(e.code or 0)\n"
        )
        r = subprocess.run([sys.executable, "-c", code], cwd=ROOT,
                           capture_output=True, text=True, timeout=120)
        assert r.returncode == 0, r.stderr[-2000:]
