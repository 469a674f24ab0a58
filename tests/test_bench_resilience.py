"""bench.wait_for_backend: a transient backend outage must degrade to a
late run (bounded poll/retry), never an instant rc=1 — the round-2 perf
artifact was voided by exactly that (BENCH_r02.json rc=1 while the axon
tunnel was down)."""

import sys
import time

import pytest

sys.path.insert(0, ".")  # repo root (bench.py lives there)

import bench  # noqa: E402


class TestWaitForBackend:
    def test_succeeds_when_backend_up(self):
        # CPU backend is always importable in the test env; the probe
        # subprocess inherits JAX_PLATFORMS=cpu from conftest
        t0 = time.time()
        bench.wait_for_backend(total_s=240.0, poll_s=1.0)
        assert time.time() - t0 < 200.0  # one probe, no retries

    def test_bounded_failure_raises(self, monkeypatch):
        # make every probe fail fast: run a python that exits nonzero
        calls = []
        import subprocess

        real_run = subprocess.run

        def fake_run(cmd, **kw):
            calls.append(cmd)
            return real_run([sys.executable, "-c", "raise SystemExit(1)"],
                            **kw)

        monkeypatch.setattr(bench.subprocess, "run", fake_run)
        t0 = time.time()
        with pytest.raises(RuntimeError, match="no usable JAX backend"):
            bench.wait_for_backend(total_s=8.0, poll_s=1.0)
        assert len(calls) >= 2  # it retried before giving up
        assert time.time() - t0 < 60.0  # and gave up at the deadline

    def test_recovers_mid_poll(self, monkeypatch):
        # first probe fails, second succeeds -> returns instead of raising
        import subprocess

        real_run = subprocess.run
        state = {"n": 0}

        def flaky_run(cmd, **kw):
            state["n"] += 1
            if state["n"] == 1:
                return real_run(
                    [sys.executable, "-c", "raise SystemExit(1)"], **kw
                )
            return real_run(
                [sys.executable, "-c", "print('cpu')"], **kw
            )

        monkeypatch.setattr(bench.subprocess, "run", flaky_run)
        bench.wait_for_backend(total_s=60.0, poll_s=0.2)
        assert state["n"] == 2


class TestSecondarySkip:
    """A crashing SECONDARY metric must degrade to a stderr skip note and
    keep the rest of the --full artifact (a compile-time OOM raised from
    .compile() once voided a 70-minute TPU run to rc=1)."""

    def test_full_survives_secondary_crash(self, monkeypatch, tmp_path,
                                           capsys):
        # Patch the SECONDARIES registry WHOLESALE — never the individual
        # bench_* attributes. Round 4 (ee44e43) added a secondary without
        # updating per-name mocks here, and the un-mocked function ran a
        # production-size 204-ch win6 solve on one CPU core inside the
        # fast tier (>65 CPU-min, non-terminating). A registry-level patch
        # makes that class of regression structurally impossible.
        def ok(name):
            return lambda: {"metric": name, "value": 1.0, "unit": "s",
                            "vs_baseline": None}

        def boom():
            raise RuntimeError("XLA:TPU compile permanent error. Ran out "
                               "of memory in memory space hbm.")

        monkeypatch.setattr(bench, "wait_for_backend", lambda: None)
        monkeypatch.setattr(bench, "SECONDARIES", [
            ok("sc"),
            ok("w6"),
            lambda: None,  # hbm-guard skip path
            boom,
            ok("fc"),
        ])
        monkeypatch.setattr(bench, "bench_vae4dvar_3dvar", ok("primary"))
        monkeypatch.setattr(bench.sys, "argv", ["bench.py", "--full"])
        monkeypatch.setattr(bench.os.path, "abspath",
                            lambda _: str(tmp_path / "bench.py"))

        bench.main()

        out = capsys.readouterr()
        got = [bench.json.loads(line)["metric"]
               for line in out.out.strip().splitlines()]
        assert got == ["sc", "w6", "fc", "primary"]  # primary LAST, crash+
        # guard-skip dropped, everything else kept
        assert "boom: SKIPPED" in out.err  # skip note names the metric fn
        assert "Ran out of memory" in out.err
        import json as _json

        saved = _json.load(open(tmp_path / "output" / "bench_full.json"))
        assert [r["metric"] for r in saved] == got

    def test_no_secondary_runs_for_real_under_registry_patch(self,
                                                             monkeypatch):
        """Every real secondary lives in bench.SECONDARIES (so patching the
        registry covers all of them), and main() iterates the registry —
        not a private list — so a future addition is automatically mocked
        by the wholesale patch above."""
        names = [fn.__name__ for fn in bench.SECONDARIES]
        assert names == [
            # train steps first: fresh-heap measurement (PERF.md r5)
            "bench_vae_train_step_any",
            "bench_forecast_train_step",
            "bench_sc4dvar_3dvar",
            "bench_vae4dvar_4dvar_win6",
            "bench_vae4dvar_4dvar_win6_140",
            "bench_vae4dvar_win6_real_obs_any",
        ], ("bench.SECONDARIES changed — update this list AND confirm "
            "test_full_survives_secondary_crash still covers the skip "
            "paths you care about (it patches the registry wholesale, so "
            "nothing new can run for real).")
        # main() must not reference the old local list pattern
        import inspect

        src = inspect.getsource(bench.main)
        assert "SECONDARIES" in src and "secondaries = [" not in src


@pytest.mark.slow
class TestTrainStepBenches:
    """The --full training-step secondaries must construct, compile, and
    report at the micro topology — a bug here would redden the TPU bench
    artifact (bench.py is the round's perf record)."""

    def test_vae_train_step_micro(self):
        r = bench.bench_vae_train_step(micro=True)
        assert r is not None
        assert r["metric"].startswith("sec_per_vae_nmc_train_step_b2")
        assert r["value"] > 0 and r["unit"] == "s"
        assert r["vs_baseline"] is None

    def test_forecast_train_step_micro(self):
        r = bench.bench_forecast_train_step(micro=True)
        assert r is not None
        assert r["metric"].startswith("sec_per_forecast_train_step_b2")
        assert r["value"] > 0 and r["unit"] == "s"
        assert r["vs_baseline"] is None
