"""Native C++ prefetching loader tests (built via make -C native)."""

import numpy as np
import pytest

from vaevar_tpu.data import native_loader


@pytest.fixture(scope="module")
def built():
    if not native_loader.available():
        if not native_loader.build():
            pytest.skip("native loader toolchain unavailable")
    return True


class TestNativeLoader:
    def test_roundtrip(self, built, tmp_path):
        shape = (3, 8, 16)
        rng = np.random.default_rng(0)
        paths, arrays = [], []
        for i in range(5):
            a = rng.normal(size=shape).astype(np.float32)
            p = str(tmp_path / f"s{i}.npy")
            np.save(p, a)
            paths.append(p)
            arrays.append(a)
        pf = native_loader.NativePrefetcher(shape, capacity=4, n_threads=2)
        for p in paths:
            pf.submit(p)
        got = [pf.next() for _ in range(5)]
        pf.close()
        # unordered delivery: match by content
        got_sorted = sorted(got, key=lambda a: float(a.sum()))
        want_sorted = sorted(arrays, key=lambda a: float(a.sum()))
        for g, w in zip(got_sorted, want_sorted):
            np.testing.assert_allclose(g, w, rtol=1e-6)

    def test_float64_input(self, built, tmp_path):
        shape = (2, 4, 4)
        a = np.arange(32, dtype=np.float64).reshape(shape)
        p = str(tmp_path / "d.npy")
        np.save(p, a)
        pf = native_loader.NativePrefetcher(shape, capacity=2, n_threads=1)
        pf.submit(p)
        g = pf.next()
        pf.close()
        np.testing.assert_allclose(g, a.astype(np.float32))

    def test_normalization(self, built, tmp_path):
        from vaevar_tpu import channels

        shape = (69, 4, 8)
        x = (
            channels.MEAN.reshape(-1, 1, 1)
            + channels.STD.reshape(-1, 1, 1) * 2.0
        ).astype(np.float32) * np.ones(shape, np.float32)
        p = str(tmp_path / "n.npy")
        np.save(p, x)
        pf = native_loader.NativePrefetcher(
            shape, capacity=2, n_threads=1, normalize=True
        )
        pf.submit(p)
        g = pf.next()
        pf.close()
        np.testing.assert_allclose(g, 2.0, rtol=1e-4)

    def test_missing_file_errors(self, built, tmp_path):
        pf = native_loader.NativePrefetcher((2, 2), capacity=2, n_threads=1)
        pf.submit(str(tmp_path / "nope.npy"))
        with pytest.raises(IOError):
            pf.next()
        pf.close()


class TestTaggedDelivery:
    def test_tags_reassemble_out_of_order_completions(self, built, tmp_path):
        shape = (4, 8)
        want = {}
        pf = native_loader.NativePrefetcher(shape, capacity=32, n_threads=4)
        for i in range(16):
            x = np.full(shape, float(i), np.float32)
            p = str(tmp_path / f"t{i}.npy")
            np.save(p, x)
            want[i] = x
            pf.submit(p, tag=i)
        got = {}
        for _ in range(16):
            arr, tag = pf.next_tagged()
            got[tag] = arr
        pf.close()
        assert set(got) == set(want)
        for i in want:
            np.testing.assert_array_equal(got[i], want[i])


class TestReferenceLayoutStore:
    def test_composites_reference_archive_layout(self, built, tmp_path):
        import pandas as pd

        from vaevar_tpu import channels
        from vaevar_tpu.data.era5 import ReferenceLayoutStore

        hw = (6, 8)
        ts = pd.Timestamp("2022-03-04 06:00:00")
        rng = np.random.default_rng(0)
        frame = rng.normal(size=(69, *hw)).astype(np.float32)
        # write the reference's per-variable files
        root = tmp_path / "arc"
        sdir = root / "single" / "2022" / "2022-03-04"
        mdir = root / "2022" / "2022-03-04"
        sdir.mkdir(parents=True)
        mdir.mkdir(parents=True)
        for i, v in enumerate(channels.SINGLE_LEVEL_VNAMES):
            np.save(sdir / f"06:00:00-{v}.npy", frame[i])
        c = 4
        for v in channels.MULTI_LEVEL_VNAMES:
            for lev in channels.PRESSURE_LEVELS:
                np.save(mdir / f"06:00:00-{v}-{lev}.0.npy", frame[c])
                c += 1
        for use_native in (False, True):
            store = ReferenceLayoutStore(str(root), hw=hw,
                                         use_native=use_native)
            assert store.has(ts)
            got = store.get_state(ts)
            np.testing.assert_array_equal(got, frame)
