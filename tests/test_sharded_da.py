"""Spatially-sharded DA solve: numerics match the single-device solve.

Runs the vae4dvar variational solve on an 8-virtual-device CPU mesh with
the (lat, lon) grid sharded 2x4 and asserts the analysis matches the
unsharded solve — the multi-chip design of SURVEY.md section 2c validated
without TPU hardware (conftest forces
xla_force_host_platform_device_count=8).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.sharded

from vaevar_tpu import config as cfgs
from vaevar_tpu.da import cost as cost_mod, obs as obs_mod
from vaevar_tpu.da.cost import ObsBundle
from vaevar_tpu.da.solver import VariationalSolver
from vaevar_tpu.models.lgunet import LGUnet
from vaevar_tpu.parallel import mesh as pmesh

HW = (32, 64)
LATENT = (1, 8, *HW)


@functools.lru_cache(maxsize=1)
def setup():
    dec_cfg = cfgs.micro_config(
        img_size=HW, inchans_list=(2, 6), outchans_list=(13, 56)
    )
    decoder = LGUnet(dec_cfg)
    z0 = jnp.zeros(LATENT, jnp.float32)
    dec_params = decoder.init(jax.random.PRNGKey(0), z0)

    rr = np.random.default_rng(3)
    xb = jnp.asarray(rr.normal(size=(69, *HW)), jnp.float32)
    gt = xb + 0.3 * jnp.asarray(rr.normal(size=(69, *HW)), jnp.float32)
    Hm = jnp.asarray(obs_mod.make_obs_mask("free_0005", 1, HW, rr))
    R = jnp.asarray(
        obs_mod.build_R(obs_mod.obs_error_variance(0.1), None, 1, HW)
    )
    bundle = ObsBundle(xb=xb, yo=gt[None], H=Hm, R=R)
    cost, to_state, parts = cost_mod.make_vae4dvar_cost(decoder.apply)
    params = {"decoder": dec_params, "flow": None}
    return cost, to_state, parts, bundle, params, z0


class TestShardedSolve:
    def test_requires_8_devices(self):
        assert jax.device_count() >= 8

    def test_state_spec_for_odd_lat_partitions_lon(self):
        """The production 0.25deg grid has 721 = 7 x 103 lat rows —
        indivisible by any practical sh — so state_spec_for must fold
        both mesh axes onto lon (1440 % 8 == 0) rather than silently
        replicate (or crash: NamedSharding rejects uneven tilings). A
        device_put at the real geometry proves the layout commits."""
        from jax.sharding import PartitionSpec as P

        mesh = pmesh.make_mesh({"sh": 2, "sw": 4})
        # divisible grid: classic (sh, sw) placement
        assert pmesh.state_spec_for(mesh, (69, 128, 256)) == P(
            None, "sh", "sw")
        # 0.25deg: lat indivisible, lon takes both axes
        assert pmesh.state_spec_for(mesh, (69, 721, 1440)) == P(
            None, None, ("sh", "sw"))
        # transposed degenerate case: lon indivisible, lat takes both
        assert pmesh.state_spec_for(mesh, (16, 721)) == P(
            ("sh", "sw"), None)
        # nothing fits: fully replicated, never an uneven tiling
        assert pmesh.state_spec_for(mesh, (7, 103)) == P(None, None)
        x = jnp.zeros((3, 721, 1440), jnp.bfloat16)
        xs = pmesh.shard(x, mesh, pmesh.state_spec_for(mesh, x.shape))
        assert not xs.sharding.is_fully_replicated
        assert xs.sharding.shard_shape(x.shape) == (3, 721, 180)

    @pytest.mark.slow
    def test_sharded_matches_unsharded(self):
        cost, to_state, parts, bundle, params, z0 = setup()
        plain = VariationalSolver(cost, to_state, parts, lbfgs_iters=4)
        xa_ref = np.asarray(
            plain.solve(z0, bundle, params, nit=1, verbose=False)[1]
        )

        mesh = pmesh.make_mesh({"sh": 2, "sw": 4})
        sharded = VariationalSolver(cost, to_state, parts, lbfgs_iters=4,
                                    mesh=mesh)
        z, xa, _ = sharded.solve(z0, bundle, params, nit=1, verbose=False)
        # the control variable carries the committed spatial sharding
        assert not z.sharding.is_fully_replicated
        # L-BFGS amplifies reduction-order noise pointwise; compare the
        # analysis increments in aggregate (measured rel-fro ~6e-6)
        inc_ref = xa_ref - np.asarray(bundle.xb)
        inc = np.asarray(xa) - np.asarray(bundle.xb)
        rel = np.linalg.norm(inc - inc_ref) / np.linalg.norm(inc_ref)
        assert rel < 1e-3, rel
        np.testing.assert_allclose(np.asarray(xa), xa_ref, atol=0.05)

    @pytest.mark.slow
    def test_sharded_solve_reduces_cost(self):
        cost, to_state, parts, bundle, params, z0 = setup()
        mesh = pmesh.make_mesh({"sh": 2, "sw": 4})
        solver = VariationalSolver(cost, to_state, parts, lbfgs_iters=6,
                                   mesh=mesh)
        j0 = float(cost(z0, bundle, params))
        z, _, _ = solver.solve(z0, bundle, params, nit=1, verbose=False)
        j1 = float(cost(z, bundle, params))
        assert j1 < j0

    @pytest.mark.slow
    def test_sharded_reduced_obs_matches_unsharded(self):
        """Mesh-sharded solve on the REDUCED obs quadratic (the config of
        record: da_win=1 + --mesh). ReducedObs carries a 0-d field (c),
        which _shard_inputs must replicate rather than spatially shard."""
        cost_f, to_state_f, parts_f, bundle, params, z0 = setup()
        del cost_f, to_state_f, parts_f
        dec_cfg = cfgs.micro_config(
            img_size=HW, inchans_list=(2, 6), outchans_list=(13, 56)
        )
        decoder = LGUnet(dec_cfg)
        cost, to_state, parts = cost_mod.make_vae4dvar_cost_reduced(
            decoder.apply
        )
        red = cost_mod.reduce_obs(bundle, HW)

        plain = VariationalSolver(cost, to_state, parts, lbfgs_iters=4)
        xa_ref = np.asarray(
            plain.solve(z0, red, params, nit=1, verbose=False)[1]
        )
        mesh = pmesh.make_mesh({"sh": 2, "sw": 4})
        sharded = VariationalSolver(cost, to_state, parts, lbfgs_iters=4,
                                    mesh=mesh)
        z, xa, _ = sharded.solve(z0, red, params, nit=1, verbose=False)
        assert not z.sharding.is_fully_replicated
        inc_ref = xa_ref - np.asarray(bundle.xb)
        inc = np.asarray(xa) - np.asarray(bundle.xb)
        rel = np.linalg.norm(inc - inc_ref) / max(np.linalg.norm(inc_ref),
                                                  1e-12)
        assert rel < 1e-3, rel

    @pytest.mark.slow
    def test_sharded_window_reduced_matches_unsharded(self):
        """Mesh-sharded 4D-Var solve on the REDUCED window quadratic
        (da_win=2 + --mesh): ReducedWindowObs carries (T,) c and coarse
        per-slot fields — _shard_inputs must shard the >=2-d grids over
        sh/sw and replicate the rest."""
        _c, _t, _p, bundle, params, z0 = setup()
        dec_cfg = cfgs.micro_config(
            img_size=HW, inchans_list=(2, 6), outchans_list=(13, 56)
        )
        decoder = LGUnet(dec_cfg)
        flow = LGUnet(cfgs.micro_config(img_size=HW))
        params = dict(params)
        params["flow"] = flow.init(jax.random.PRNGKey(5),
                                   jnp.zeros((1, 69, *HW)))
        rr = np.random.default_rng(9)
        yo2 = jnp.concatenate(
            [bundle.yo,
             bundle.yo + 0.1 * jnp.asarray(
                 rr.normal(size=bundle.yo.shape), jnp.float32)], axis=0)
        Hm2 = jnp.asarray(obs_mod.make_obs_mask("free_0005", 2, HW, rr))
        R2 = jnp.asarray(
            obs_mod.build_R(obs_mod.obs_error_variance(0.1), None, 2, HW))
        bundle2 = ObsBundle(xb=bundle.xb, yo=yo2, H=Hm2, R=R2)

        cost, to_state, parts = cost_mod.make_vae4dvar_cost_window_reduced(
            decoder.apply, flow.apply, da_win=2)
        red = cost_mod.reduce_obs_window(bundle2, HW)

        plain = VariationalSolver(cost, to_state, parts, lbfgs_iters=4)
        xa_ref = np.asarray(
            plain.solve(z0, red, params, nit=1, verbose=False)[1])
        mesh = pmesh.make_mesh({"sh": 2, "sw": 4})
        sharded = VariationalSolver(cost, to_state, parts, lbfgs_iters=4,
                                    mesh=mesh)
        z, xa, _ = sharded.solve(z0, red, params, nit=1, verbose=False)
        assert not z.sharding.is_fully_replicated
        inc_ref = xa_ref - np.asarray(bundle.xb)
        inc = np.asarray(xa) - np.asarray(bundle.xb)
        rel = np.linalg.norm(inc - inc_ref) / max(np.linalg.norm(inc_ref),
                                                  1e-12)
        assert rel < 1e-3, rel

    @pytest.mark.slow
    def test_sharded_realobs_augmented_window_matches_unsharded(self):
        """Mesh-sharded REAL-OBS (level-augmented) 4D-Var window solve —
        the one production cost family that genuinely NEEDS the mesh: at
        0.25deg the (T, 204, H, W) yo/H alone are ~10.2 GiB, over one
        v5e chip (bench.py pre-gate), so the augmented window cost must
        run with its obs tensors partitioned over sh x sw. The innovation
        is pointwise in (H, W) and the level-augment einsum contracts
        channels only, so GSPMD keeps the obs term fully local; the
        per-iteration segment dispatch is the production granularity for
        this non-reducible cost (cycler._window_dispatch_kw fallback).
        Reference: da_4dvar.py:1196-1206."""
        from vaevar_tpu.ops.interp import (
            augment_levels,
            obs_level_interp_matrix,
        )

        _c, _t, _p, bundle, params, z0 = setup()
        da_win = 2
        dec_cfg = cfgs.micro_config(
            img_size=HW, inchans_list=(2, 6), outchans_list=(13, 56)
        )
        decoder = LGUnet(dec_cfg)
        flow = LGUnet(cfgs.micro_config(img_size=HW))
        params = dict(params)
        params["flow"] = flow.init(jax.random.PRNGKey(5),
                                   jnp.zeros((1, 69, *HW)))

        interp = jnp.asarray(obs_level_interp_matrix(40))
        rr = np.random.default_rng(11)
        gt2 = jnp.stack([bundle.yo[0], bundle.yo[0] + 0.05])
        gt_aug = augment_levels(gt2, interp)  # (T, 204, H, W)
        c_obs = gt_aug.shape[1]
        cols = rr.random((1, 1, *HW)) < 0.02  # station columns
        lvl = rr.random((da_win, c_obs, 1, 1)) < 0.6
        Hm = jnp.asarray((cols & lvl).astype(np.float32))
        Hm = jnp.broadcast_to(Hm, (da_win, c_obs, *HW))
        R2 = jnp.asarray(
            obs_mod.build_R(obs_mod.obs_error_variance(0.1), None, da_win,
                            HW))
        R_aug = augment_levels(R2, interp)
        bundle2 = ObsBundle(xb=bundle.xb, yo=gt_aug * Hm, H=Hm, R=R_aug)

        cost, to_state, parts = cost_mod.make_vae4dvar_cost(
            decoder.apply, flow.apply, flow_hw=HW, da_win=da_win,
            interp_matrix=interp,
        )
        plain = VariationalSolver(cost, to_state, parts, lbfgs_iters=4,
                                  segment_dispatch=True,
                                  iters_per_dispatch=1)
        xa_ref = np.asarray(
            plain.solve(z0, bundle2, params, nit=1, verbose=False)[1]
        )
        mesh = pmesh.make_mesh({"sh": 2, "sw": 4})
        sharded = VariationalSolver(cost, to_state, parts, lbfgs_iters=4,
                                    mesh=mesh, segment_dispatch=True,
                                    iters_per_dispatch=1)
        z, xa, _ = sharded.solve(z0, bundle2, params, nit=1, verbose=False)
        assert not z.sharding.is_fully_replicated
        # the big obs tensors must actually be partitioned, not replicated
        assert not sharded._last_bundle_shardings["yo"].is_fully_replicated
        inc_ref = xa_ref - np.asarray(bundle.xb)
        inc = np.asarray(xa) - np.asarray(bundle.xb)
        rel = np.linalg.norm(inc - inc_ref) / max(np.linalg.norm(inc_ref),
                                                  1e-12)
        assert rel < 1e-3, rel

    @pytest.mark.slow
    def test_tp_spatial_combined_mesh_matches_unsharded(self):
        """The tp x sh x sw COMBINED mesh (the PERF.md round-3 plan for
        the 0.25deg decoder solve): decoder params tensor-parallel over
        'tp' (LG-stage qkv/fc1 column-, proj/fc2 row-parallel) while the
        grid shards over sh/sw in the same jitted solve. Verifies
        (a) solver._shard_inputs preserves the deliberate tp placements
        (replicate_missing) and (b) the combined-mesh analysis matches
        the single-device solve."""
        cost_f, to_state_f, parts_f, bundle, params, z0 = setup()
        del cost_f, to_state_f, parts_f
        dec_cfg = cfgs.micro_config(
            img_size=HW, inchans_list=(2, 6), outchans_list=(13, 56)
        )
        decoder = LGUnet(dec_cfg)
        cost, to_state, parts = cost_mod.make_vae4dvar_cost_reduced(
            decoder.apply
        )
        red = cost_mod.reduce_obs(bundle, HW)

        plain = VariationalSolver(cost, to_state, parts, lbfgs_iters=4)
        xa_ref = np.asarray(
            plain.solve(z0, red, params, nit=1, verbose=False)[1]
        )

        mesh = pmesh.make_mesh({"tp": 2, "sh": 2, "sw": 2})
        tp_params = dict(params)
        tp_params["decoder"] = pmesh.shard_tensor_parallel(
            params["decoder"], mesh
        )
        # the deliberate placement exists before the solve...
        leaves = jax.tree_util.tree_leaves_with_path(tp_params["decoder"])
        tp_kernels = [l for p, l in leaves
                      if "lg" in jax.tree_util.keystr(p)
                      and not l.sharding.is_fully_replicated]
        assert tp_kernels, "no tensor-parallel leaves were placed"

        sharded = VariationalSolver(cost, to_state, parts, lbfgs_iters=4,
                                    mesh=mesh)
        z, xa, _ = sharded.solve(z0, red, tp_params, nit=1, verbose=False)
        assert not z.sharding.is_fully_replicated
        inc_ref = xa_ref - np.asarray(bundle.xb)
        inc = np.asarray(xa) - np.asarray(bundle.xb)
        rel = np.linalg.norm(inc - inc_ref) / max(np.linalg.norm(inc_ref),
                                                  1e-12)
        assert rel < 1e-3, rel

    def test_replicate_missing_preserves_placements(self):
        mesh = pmesh.make_mesh({"tp": 2, "sh": 2, "sw": 2})
        from jax.sharding import NamedSharding, PartitionSpec as P

        a = jax.device_put(jnp.zeros((4, 8)), NamedSharding(mesh, P(None,
                                                                    "tp")))
        tree = {"kept": a, "plain": jnp.ones((3,))}
        out = pmesh.replicate_missing(tree, mesh)
        assert out["kept"].sharding.spec == P(None, "tp")
        assert out["plain"].sharding.is_fully_replicated

    def test_host_value_reads_any_layout(self):
        """mesh.host_value: identity on numpy, exact readback of sharded
        and replicated device arrays (the cycler's checkpoint/field-dump
        read path; its cross-process allgather branch is exercised by
        tests/test_multiprocess.py)."""
        mesh = pmesh.make_mesh({"sh": 2, "sw": 4})
        a = np.arange(8 * 16, dtype=np.float32).reshape(8, 16)
        np.testing.assert_array_equal(pmesh.host_value(a), a)
        s = pmesh.shard(a, mesh, pmesh.state_spec(mesh, 2))
        np.testing.assert_array_equal(pmesh.host_value(s), a)
        r = pmesh.shard(a, mesh, jax.sharding.PartitionSpec())
        np.testing.assert_array_equal(pmesh.host_value(r), a)

    def test_obs_term_sharded_equals_replicated(self):
        cost, to_state, parts, bundle, params, z0 = setup()
        mesh = pmesh.make_mesh({"sh": 2, "sw": 4})
        # broadcastable fields (per-channel R, (T, C, 1, 1)) replicate —
        # size-1 spatial dims can't split over sh/sw (solver._shard_inputs
        # applies the same rule)
        from jax.sharding import PartitionSpec as P

        def spec(f):
            full = jnp.ndim(f) >= 2 and f.shape[-1] > 1 and f.shape[-2] > 1
            return pmesh.state_spec(mesh, jnp.ndim(f)) if full else P()

        sharded_bundle = ObsBundle(
            *(pmesh.shard(f, mesh, spec(f)) for f in bundle)
        )
        a = float(cost_mod.obs_term(bundle.yo * 0.9, bundle))
        b = float(cost_mod.obs_term(sharded_bundle.yo * 0.9, sharded_bundle))
        assert abs(a - b) / abs(a) < 1e-6
