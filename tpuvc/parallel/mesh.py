"""Device-mesh utilities: data parallelism over ICI.

The reference has no multi-device parallelism (SURVEY.md 2.5 — single CUDA
device, host DataLoader workers). The TPU-native replacement is sharded
jit over a 1-D ``data`` mesh: the batch axis is sharded across chips,
parameters are replicated, and XLA inserts the gradient all-reduce (psum)
over ICI from the sharding annotations alone — no explicit collectives in
model code.

The mesh is 1-D ``("data",)`` by default; codecs here are 10-40M-parameter
CNNs, so model parallelism is unnecessary (the batch axis is the only
profitable one). A second ``space`` axis for spatial sharding of 1080p
frames (halo-exchange CP analog, SURVEY.md 2.5.3) can be added to the same
helpers when needed.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def shard_batch(mesh: Mesh, tree, axis: str = "data"):
    """Place a pytree of arrays with the leading dim sharded over the mesh."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params, opt state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def shard_spatial(mesh: Mesh, tree, axis: str = "data"):
    """Shard the H dimension of NHWC frames across the mesh.

    The context-parallel analog for 1080p frames (SURVEY.md 2.5.3): XLA's
    SPMD partitioner inserts halo exchanges for the convolutions and
    collectives for global ops from the sharding annotation alone. Set
    ``TPUVC_WARP=xla`` under spatial sharding (tpuvc.ops.warp routing) — a
    custom Pallas call cannot be partitioned and would force a gather of
    the full frame.

    Constraint: every downsampling level of the model must keep at least
    ``stride`` rows per device — XLA's SPMD partitioner miscomputes
    strided convolutions when a shard holds fewer rows than the stride
    (repro: tests/test_scheduler.py::TestSpatialSharding). For the /64
    deepest hyper-latents this bounds the mesh to H/128 devices (1080p:
    up to 8).
    """
    sharding = NamedSharding(mesh, P(None, axis, None, None))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def level_batch_sharder(mesh: Mesh, axis: str = "data"):
    """Sharding rule for REAL-bitstream level-batched coding.

    Returns ``shard(tree) -> tree`` placing each array's batch axis over
    the mesh when divisible, replicated otherwise. The rule is a pure
    function of (batch, mesh size), so an encoder and a decoder built
    over same-sized meshes make identical placement decisions — which
    they must: resharding changes which program XLA compiles, and the
    decoder re-derives entropy parameters that have to be bit-identical
    to the encoder's (VSequenceBitstream records the mesh size for this).
    Unlike shard_eval, no padding: coded frames can't be dropped, so
    non-divisible level batches stay replicated.
    """
    n = int(mesh.devices.size)
    split = NamedSharding(mesh, P(axis))
    full = NamedSharding(mesh, P())

    def shard(tree):
        return jax.tree.map(
            lambda x: jax.device_put(
                x, split if x.shape[0] % n == 0 else full
            ),
            tree,
        )

    return shard


def shard_eval(mesh: Mesh, fn, axis: str = "data"):
    """Data-parallel wrapper for a batched eval forward.

    The GOP scheduler's level batches (tpuvc.gop.scheduler) are the eval
    parallelism axis: frames within a hierarchy level are independent, so
    the batch shards across the mesh and each chip codes its share. ``fn``
    takes arrays with a common leading batch dim and returns a pytree of
    arrays with that leading dim. Batches not divisible by the mesh size
    are padded by repeating the last row (padded rows are computed and
    dropped — an under-populated level can't fill the mesh anyway).
    """
    import jax.numpy as jnp

    n = mesh.devices.size

    def wrapped(*args):
        b = args[0].shape[0]
        pad = (-b) % n
        if pad:
            args = tuple(
                jnp.concatenate([a, jnp.repeat(a[-1:], pad, axis=0)])
                for a in args
            )
        args = shard_batch(mesh, args, axis=axis)
        out = fn(*args)
        if pad:
            out = jax.tree.map(lambda x: x[:b], out)
        return out

    return wrapped
