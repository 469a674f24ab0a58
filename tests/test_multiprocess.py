"""True multi-process data-parallel training test (multihost analogue).

The reference's distributed surface is multi-process NCCL DDP
(utils/misc.py:296-369, train_vae.py:40-44). The sharded-training unit
tests elsewhere run single-process on 8 virtual devices; this test
launches TWO OS processes, each owning 4 virtual CPU devices, connected
through jax.distributed (Gloo), and asserts the cross-process run
reproduces the single-process run exactly: same per-step losses, same
post-training parameter checksum on every rank (the
check_ddp_consistency guarantee, utils/misc.py:408-420).
"""

import json
import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.sharded

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_dp_matches_single_process():
    import jax

    from tests.mh_worker import run_steps
    from vaevar_tpu.parallel import mesh as pmesh

    # golden: single-process dp=8 over this process's 8 virtual devices
    mesh = pmesh.make_mesh({"dp": 8}, jax.devices()[:8])
    gold_losses, gold_sum = run_steps(mesh, rank=0, world=1, local_bs=16)

    port = _free_port()
    env = dict(
        os.environ,
        PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""),
    )
    workers = [
        subprocess.Popen(
            [sys.executable, os.path.join(HERE, "mh_worker.py"),
             str(port), str(pid), "2"],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
            cwd=REPO, text=True,
        )
        for pid in range(2)
    ]
    outs = [w.communicate(timeout=600) for w in workers]
    for w, (out, err) in zip(workers, outs):
        assert w.returncode == 0, f"worker failed:\n{out}\n{err}"

    results = [json.loads((out.strip().splitlines())[-1])
               for out, _ in outs]
    results.sort(key=lambda r: r["rank"])
    assert [r["rank"] for r in results] == [0, 1]

    # every rank agrees with every other rank (replication invariant)
    assert results[0]["losses"] == pytest.approx(results[1]["losses"])
    assert results[0]["checksum"] == pytest.approx(results[1]["checksum"])
    # and the 2-process world reproduces the single-process trajectory:
    # the global permutation is shared, so the global batch is the same
    # sample set; batch-mean losses and all-reduced grads must match
    assert results[0]["losses"] == pytest.approx(gold_losses, rel=1e-5)
    assert results[0]["checksum"] == pytest.approx(gold_sum, rel=1e-5)


@pytest.mark.slow
def test_two_process_sharded_da_solve_matches_single_process():
    """The v5p-16 north-star path (SURVEY.md section 2c): the spatially-
    sharded vae4dvar solve on a (sh, sw) mesh spanning TWO OS processes
    over jax.distributed (Gloo). Asserts (a) both ranks read identical
    diagnostics off the process-spanning arrays — every host-read surface
    of VariationalSolver works multihost — and (b) the 2-process solve
    reproduces the single-process solve on the same global mesh shape."""
    import jax

    from tests.mh_worker import run_da_solve
    from vaevar_tpu.parallel import mesh as pmesh

    gold = run_da_solve(pmesh.make_mesh({"sh": 2, "sw": 4},
                                        jax.devices()[:8]))
    assert gold["jo"][-1] < gold["jo"][0]  # the analysis actually moved

    port = _free_port()
    env = dict(
        os.environ,
        PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""),
    )
    workers = [
        subprocess.Popen(
            [sys.executable, os.path.join(HERE, "mh_worker.py"),
             str(port), str(pid), "2", "da"],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
            cwd=REPO, text=True,
        )
        for pid in range(2)
    ]
    outs = [w.communicate(timeout=600) for w in workers]
    for w, (out, err) in zip(workers, outs):
        assert w.returncode == 0, f"worker failed:\n{out}\n{err}"
    results = [json.loads((out.strip().splitlines())[-1])
               for out, _ in outs]
    results.sort(key=lambda r: r["rank"])
    assert [r["rank"] for r in results] == [0, 1]

    # ranks participate in ONE collective program: identical values
    # (xa_host_sum covers mesh.host_value's cross-process allgather)
    for key in ("jb", "jo", "wrmse_last", "xa_sum", "xa_sq", "xa_host_sum"):
        assert results[0][key] == pytest.approx(results[1][key], rel=1e-12)
    # cross-process == single-process at the same global mesh shape
    # (L-BFGS amplifies reduction-order noise; aggregate tolerance)
    for key in ("jb", "jo", "wrmse_last"):
        assert results[0][key] == pytest.approx(gold[key], rel=1e-4), key
    assert results[0]["xa_sq"] == pytest.approx(gold["xa_sq"], rel=1e-4)
    assert results[0]["xa_host_sum"] == pytest.approx(
        gold["xa_host_sum"], rel=1e-4, abs=1e-2)


@pytest.mark.slow
def test_two_process_sharded_da_cli(tmp_path):
    """The shipped CLI on a process-spanning mesh: two OS processes
    (SLURM-style env bootstrap -> run_da's init_distributed, Gloo), each
    owning 4 virtual CPU devices, run one micro vae4dvar cycle with
    --mesh 2x4 sharding the (lat, lon) grid over the 8 GLOBAL devices.
    Both controllers must complete the cycle and persist identical state
    (cycler host reads/dumps go through mesh.host_value)."""
    import numpy as np

    port = _free_port()
    dirs = [str(tmp_path / f"w{pid}") for pid in range(2)]
    args = [
        "--da_mode", "vae4dvar", "--obs_type", "free_0005", "--fast_init",
        "--grid", "32x64", "--solver_grid", "32x64", "--micro",
        "--mesh", "2x4", "--Nit", "2", "--use_eval", "--save_field",
        "--start_time", "2022-01-01 00:00:00",
        "--end_time", "2022-01-01 06:00:00",
    ]
    workers = []
    for pid in range(2):
        env = dict(
            os.environ,
            PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""),
            XLA_FLAGS="--xla_force_host_platform_device_count=4",
            JAX_PLATFORMS="cpu",
            JAX_COORDINATOR_ADDRESS=f"localhost:{port}",
            SLURM_NTASKS="2",
            SLURM_PROCID=str(pid),
        )
        workers.append(subprocess.Popen(
            [sys.executable, os.path.join(REPO, "run_da.py"),
             "--work_dir", dirs[pid], *args],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
            cwd=REPO, text=True,
        ))
    outs = [w.communicate(timeout=900) for w in workers]
    for w, (out, err) in zip(workers, outs):
        assert w.returncode == 0, \
            f"worker failed:\n{out[-3000:]}\n{err[-3000:]}"
        assert "DA complete" in out

    run = "run_stdmodify2_free_0005_std0.005_win1_Nit2"
    states = [np.load(os.path.join(d, run, "xb.npy")) for d in dirs]
    assert states[0].shape == (69, 32, 64)
    # both controllers saw the same global arrays: identical persisted
    # state, analyses, and metric dumps
    np.testing.assert_array_equal(states[0], states[1])
    for fname in ("ana_wrmse.npy", "error_obs.npy"):
        a, b = (np.load(os.path.join(d, run, fname)) for d in dirs)
        np.testing.assert_array_equal(a, b)
    xa = [np.load(os.path.join(d, run, "xa_2022-01-01_00:00:00.npy"))
          for d in dirs]
    np.testing.assert_array_equal(xa[0], xa[1])
    assert np.isfinite(xa[0]).all()


@pytest.mark.slow
def test_two_process_tp_spatial_mesh_cli(tmp_path):
    """The COMBINED tp x sh x sw mesh through the shipped CLI across two
    OS processes (the PERF.md round-3 plan: tp x spatial meshes for the
    0.25deg decoder solve, exercised here at micro shapes): --mesh 2x2x2
    puts decoder/flow LG matmuls tensor-parallel over 'tp' while the
    (lat, lon) grid shards over sh x sw, the whole solve spanning the two
    processes over jax.distributed (Gloo)."""
    import numpy as np

    port = _free_port()
    dirs = [str(tmp_path / f"w{pid}") for pid in range(2)]
    args = [
        "--da_mode", "vae4dvar", "--obs_type", "free_0005", "--fast_init",
        "--grid", "32x64", "--solver_grid", "32x64", "--micro",
        "--mesh", "2x2x2", "--Nit", "1",
        "--start_time", "2022-01-01 00:00:00",
        "--end_time", "2022-01-01 06:00:00",
    ]
    workers = []
    for pid in range(2):
        env = dict(
            os.environ,
            PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""),
            XLA_FLAGS="--xla_force_host_platform_device_count=4",
            JAX_PLATFORMS="cpu",
            JAX_COORDINATOR_ADDRESS=f"localhost:{port}",
            SLURM_NTASKS="2",
            SLURM_PROCID=str(pid),
        )
        workers.append(subprocess.Popen(
            [sys.executable, os.path.join(REPO, "run_da.py"),
             "--work_dir", dirs[pid], *args],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
            cwd=REPO, text=True,
        ))
    outs = [w.communicate(timeout=900) for w in workers]
    for w, (out, err) in zip(workers, outs):
        assert w.returncode == 0, \
            f"worker failed:\n{out[-3000:]}\n{err[-3000:]}"
        assert "DA complete" in out

    run = "run_stdmodify2_free_0005_std0.005_win1_Nit1"
    states = [np.load(os.path.join(d, run, "xb.npy")) for d in dirs]
    assert states[0].shape == (69, 32, 64)
    np.testing.assert_array_equal(states[0], states[1])
    assert np.isfinite(states[0]).all()
