"""Device mesh construction and sharding specs.

Parallelism is mesh-native (jax.sharding + jit): the reference's only
strategy was DDP over NCCL (utils/misc.py:296-369); here

- "dp" shards the training batch (gradient all-reduce inserted by XLA),
- "sh"/"sw" shard the (lat, lon) grid of states and activations for the
  0.25deg decoder/rollout — the domain analogue of context parallelism;
  shifted-window rolls and conv halos become ICI ppermute collectives
  emitted by the compiler from sharding constraints.

Params stay replicated (the backbone is ~0.2-0.9 GB, far under HBM).
"""

from __future__ import annotations

import os
from typing import Mapping

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> int:
    """Multihost bootstrap — the reference's SLURM-env
    `init_distributed_mode` (utils/misc.py:296-323) rebuilt for JAX.

    On TPU pods `jax.distributed.initialize()` autodetects everything; on
    other launchers pass (or export JAX_COORDINATOR_ADDRESS /
    SLURM_NTASKS / SLURM_PROCID). No-op in single-process runs — returns
    the process index either way.
    """
    env = os.environ
    coordinator = coordinator or env.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "SLURM_NTASKS" in env:
        num_processes = int(env["SLURM_NTASKS"])
    if process_id is None and "SLURM_PROCID" in env:
        process_id = int(env["SLURM_PROCID"])
    multiproc = (num_processes or 1) > 1 or coordinator is not None
    world = (coordinator, num_processes, process_id)
    if multiproc and _distributed_initialized[0] is None:
        # must run BEFORE anything initializes the XLA backend (even
        # jax.process_count() would); idempotence via a module flag plus
        # tolerating the already-initialized error, NOT private jax state
        try:
            jax.distributed.initialize(
                coordinator_address=coordinator,
                num_processes=num_processes,
                process_id=process_id,
            )
        except RuntimeError as e:
            if "already" not in str(e).lower():
                raise
        _distributed_initialized[0] = world
    elif multiproc and _distributed_initialized[0] != world:
        # a second init with a DIFFERENT world must not silently proceed
        # with the previously initialized one
        raise RuntimeError(
            "init_distributed called twice with different worlds: "
            f"first {_distributed_initialized[0]}, now {world}"
        )
    return jax.process_index()


# None = never initialized; else the (coordinator, num_processes,
# process_id) of the first successful init.
_distributed_initialized: list = [None]


def make_mesh(axes: Mapping[str, int] | None = None, devices=None) -> Mesh:
    """Mesh over available devices, e.g. axes={"dp": 2, "sh": 2, "sw": 2}."""
    devices = devices if devices is not None else jax.devices()
    if axes is None:
        axes = {"dp": len(devices)}
    names = tuple(axes.keys())
    shape = tuple(axes.values())
    if int(np.prod(shape)) != len(devices):
        raise ValueError(f"mesh {axes} != {len(devices)} devices")
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, names)


def mesh_from_arg(arg: str) -> Mesh:
    """CLI `--mesh` parser shared by the training CLIs: 'DP' (e.g. '8')
    for pure data parallelism or 'DPxSHxSW' (e.g. '2x2x2') to add spatial
    sharding; uses the first prod(dims) visible devices."""
    dims = [int(v) for v in arg.split("x")]
    if len(dims) == 1:
        axes = {"dp": dims[0]}
    elif len(dims) == 3:
        axes = {"dp": dims[0], "sh": dims[1], "sw": dims[2]}
    else:
        raise ValueError(f"--mesh must be 'DP' or 'DPxSHxSW', got {arg!r}")
    total = int(np.prod(dims))
    return make_mesh(axes, jax.devices()[:total])


def batch_spec(mesh: Mesh) -> P:
    return P("dp") if "dp" in mesh.axis_names else P()


def state_spec(mesh: Mesh, ndim: int = 3) -> P:
    """Shard the trailing (H, W) of a (..., H, W) state over sh/sw."""
    sh = "sh" if "sh" in mesh.axis_names else None
    sw = "sw" if "sw" in mesh.axis_names else None
    lead = [None] * (ndim - 2)
    return P(*lead, sh, sw)


def state_spec_for(mesh: Mesh, shape) -> P:
    """Shape-aware `state_spec`: a mesh axis is only placed on a dim it
    evenly divides (NamedSharding rejects uneven tilings). The production
    0.25deg grid has 721 = 7 x 103 lat rows — indivisible by any practical
    `sh` — so when lat can't take `sh` but lon divides sh*sw, BOTH axes go
    on lon (1440 % 8 == 0 on a v5e-8), keeping the array fully partitioned
    instead of silently replicated. Falls back to dropping whichever axis
    fits nowhere."""
    names = mesh.axis_names
    nsh = dict(zip(names, mesh.devices.shape))
    h, w = shape[-2], shape[-1]
    lead = [None] * (len(shape) - 2)
    sh_ok = "sh" in names and h % nsh["sh"] == 0
    sw_ok = "sw" in names and w % nsh["sw"] == 0
    if sh_ok and sw_ok:
        return P(*lead, "sh", "sw")
    if ("sh" in names and "sw" in names and not sh_ok
            and w % (nsh["sh"] * nsh["sw"]) == 0):
        return P(*lead, None, ("sh", "sw"))
    if ("sh" in names and "sw" in names and not sw_ok
            and h % (nsh["sh"] * nsh["sw"]) == 0):
        return P(*lead, ("sh", "sw"), None)
    return P(*lead, "sh" if sh_ok else None, "sw" if sw_ok else None)


def nhwc_spec(mesh: Mesh, batch: bool = True) -> P:
    """Shard (B, H, W, C) activations over (dp, sh, sw, -)."""
    dp = "dp" if (batch and "dp" in mesh.axis_names) else None
    sh = "sh" if "sh" in mesh.axis_names else None
    sw = "sw" if "sw" in mesh.axis_names else None
    return P(dp, sh, sw, None)


def shard(x, mesh: Mesh, spec: P):
    return jax.device_put(x, NamedSharding(mesh, spec))


def shard_experts(params, mesh: Mesh, num_experts: int):
    """Expert-parallel placement for stacked-expert MoE params: any leaf
    whose leading dim equals `num_experts` (the (E, in, out) expert banks
    of zoo.MoEDense / ops/moe.py) shards that dim over the mesh's "ep"
    axis; everything else replicates. GSPMD then computes each device's
    expert slice locally and psums the dense one-hot combine — the
    expert-parallel dispatch the reference's MoE never had (its
    FusedExperts run all experts on one device, moe_utils.py:264-361)."""
    def put(leaf):
        if getattr(leaf, "ndim", 0) >= 1 and leaf.shape[0] == num_experts:
            spec = P("ep", *([None] * (leaf.ndim - 1)))
        else:
            spec = P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree.map(put, params)


def shard_tensor_parallel(params, mesh: Mesh, scope: str = "lg"):
    """Megatron-style tensor parallelism for the backbone's dense-heavy
    LG stage (models/lgunet.py): qkv / MLP-fc1 kernels column-parallel
    (output features over "tp"), attention-proj / MLP-fc2 kernels
    row-parallel (input features over "tp"), everything else replicated.
    GSPMD inserts the psums at the row-parallel boundaries. Leaves may
    carry leading nn.scan depth axes, so specs index from the END.
    `scope` limits the rules to param paths containing that substring
    (the enc/dec stages' dim-96 layers are latency-bound and not worth
    splitting, docs/PERF.md)."""
    from jax.tree_util import keystr, tree_map_with_path

    def put(path, leaf):
        s = keystr(path)
        nd = getattr(leaf, "ndim", 0)
        spec = P()
        if scope in s and nd >= 1:
            lead2 = [None] * (nd - 2)
            col_k = ("qkv" in s or "fc1" in s) and "kernel" in s and nd >= 2
            col_b = ("qkv" in s or "fc1" in s) and "bias" in s
            row_k = ("proj" in s or "fc2" in s) and "kernel" in s and nd >= 2
            if col_k:
                spec = P(*lead2, None, "tp")
            elif col_b:
                spec = P(*([None] * (nd - 1)), "tp")
            elif row_k:
                spec = P(*lead2, "tp", None)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return tree_map_with_path(put, params)


def host_value(x) -> "np.ndarray":
    """np.asarray that also works for process-spanning jax.Arrays (a mesh
    over multiple hosts, the v5p-16 north-star path): replicated arrays
    read the local replica; spatially-sharded arrays are allgathered to
    every host first. Host-side consumers (cycle checkpoints, field
    dumps, metric logs) go through here so the cycler is layout-agnostic."""
    import numpy as np

    if (isinstance(x, jax.Array) and not x.is_fully_addressable
            and not x.is_fully_replicated):
        from jax.experimental import multihost_utils

        x = multihost_utils.process_allgather(x, tiled=True)
    return np.asarray(x)


def constrain(x, mesh: Mesh, spec: P):
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def replicate(tree, mesh: Mesh):
    return jax.device_put(tree, NamedSharding(mesh, P()))


def replicate_missing(tree, mesh: Mesh):
    """Replicate every leaf NOT already committed to `mesh`. Leaves that
    were deliberately placed — e.g. tensor-parallel kernels from
    shard_tensor_parallel or expert banks from shard_experts — keep
    their shardings, so a tp x sh x sw solve mesh composes: the solver
    replicates the remaining params without undoing the tp placement."""
    repl = NamedSharding(mesh, P())

    def put(leaf):
        s = getattr(leaf, "sharding", None)
        if isinstance(s, NamedSharding) and s.mesh == mesh:
            return leaf
        return jax.device_put(leaf, repl)

    return jax.tree.map(put, tree)


def global_batch(local_batch, mesh: Mesh, spec: P):
    """Assemble a (possibly multihost) global batch from this process's
    local shard. Single-process: a plain sharded device_put. Multihost:
    each process contributes its slice of the dp axis
    (jax.make_array_from_process_local_data) — together with
    data.nmc.epoch_indices(rank, world_size) this is the reference's
    DistributedSampler+DDP input path (utils/builder.py:128-138)."""
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(sharding, local_batch)
    return jax.device_put(local_batch, sharding)
