"""Device-mesh utilities: the framework's distributed backbone.

The reference has no distributed machinery at all (single-device torch,
SURVEY §2); this framework makes multi-chip first-class via `jax.sharding`:
 - data-parallel training: batch sharded over the 'data' axis, parameters
   replicated, XLA inserts the psum gradient reduction over ICI;
 - dataset/patch-bank sharding for the analytic score machines: each device
   streams its shard of the training set through the online softmax and the
   partial (max, s1, s2) states merge with the associative
   `scores.common.merge_states` combine — mathematically identical to the
   sequential stream;
 - multi-seed sampling: seeds sharded over 'data'.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "shard_batch",
    "replicate",
    "data_spec",
    "init_distributed",
]


def init_distributed() -> int:
    """Multi-host initialization (DCN): call once per process before any
    other jax API when running under a multi-host launcher. No-op (returns
    process count 1) when the standard coordinator env vars are absent, so
    single-host code paths need no changes.

    Launcher contract: `JAX_COORDINATOR_ADDRESS` (or `COORDINATOR_ADDRESS`)
    names the rank-0 endpoint; `JAX_NUM_PROCESSES`/`JAX_PROCESS_ID` are
    passed through explicitly when set (manual launchers, and the 2-process
    CPU test in tests/test_multihost.py), otherwise jax's cluster
    auto-detection fills them (SLURM/OpenMPI/TPU pods). On the CPU backend
    cross-process collectives need the gloo transport, which is off by
    default — selected here before backend init.

    Sharding layout note (SURVEY §5): keep the 'data' axis ordered so
    consecutive mesh positions are intra-host — the streaming-softmax merge
    (one pmax + two psums) and the gradient psum then ride ICI within a
    host/slice and touch DCN only at slice boundaries; `make_mesh` uses
    jax.devices() order, which JAX already arranges host-major.
    """
    import os

    addr = os.environ.get("COORDINATOR_ADDRESS") or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if not addr:
        return 1
    if jax.config.jax_platforms and "cpu" in str(jax.config.jax_platforms):
        try:
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        except Exception:  # older jax: single transport, nothing to select
            pass
    kw = {"coordinator_address": addr}
    nproc = os.environ.get("JAX_NUM_PROCESSES")
    pid = os.environ.get("JAX_PROCESS_ID")
    if nproc is not None:
        kw["num_processes"] = int(nproc)
    if pid is not None:
        kw["process_id"] = int(pid)
    jax.distributed.initialize(**kw)
    return jax.process_count()


def make_mesh(
    n_devices: Optional[int] = None, axis_names: Sequence[str] = ("data",)
) -> Mesh:
    """1-D (or factored) device mesh over the first n devices (all processes'
    devices under multi-host — see init_distributed)."""
    devs = jax.devices()
    n = n_devices or len(devs)
    devs = np.asarray(devs[:n])
    if len(axis_names) == 1:
        shape = (n,)
    else:
        # factor n as evenly as possible over the requested axes, larger
        # factors first (axis 0 is conventionally 'data'): 8 over 2 axes
        # -> (4, 2); 8 over 3 -> (2, 2, 2); primes degrade to (n, 1, ...)
        sizes = []
        rem = n
        for axes_left in range(len(axis_names), 1, -1):
            target = int(round(rem ** (1.0 / axes_left)))
            d = max(
                dd for dd in range(1, max(target, 1) + 1) if rem % dd == 0
            )
            sizes.append(d)  # the LAST remaining axis gets the small factor
            rem //= d
        shape = (rem, *reversed(sizes))
    return Mesh(devs.reshape(shape), axis_names)


def data_spec(ndim: int, axis: str = "data") -> P:
    """PartitionSpec sharding dim 0 over `axis`, replicating the rest."""
    return P(axis, *([None] * (ndim - 1)))


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place a pytree of arrays with dim-0 sharded over the mesh axis."""

    def put(x):
        return jax.device_put(x, NamedSharding(mesh, data_spec(x.ndim, axis)))

    return jax.tree_util.tree_map(put, batch)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree across the mesh."""

    def put(x):
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map(put, tree)
