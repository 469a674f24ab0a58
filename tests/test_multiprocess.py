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
