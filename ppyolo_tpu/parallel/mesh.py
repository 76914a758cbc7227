"""Device-mesh utilities: data-parallel (+ optional model-replica) sharding
for PP-YOLO training and inference.

The reference has no distributed support of any kind (README.md:84-86 lists
multi-card training as unimplemented; sync_bn silently degrades to bn,
custom_layers.py:26-29).  Here multi-chip is first-class:

  * ``make_mesh('data')`` over all devices (ICI within a slice).
  * ``shard_train_step`` wraps the train step in ``shard_map``: batch sharded
    over 'data', params/optimizer replicated, gradients psum'd, BN statistics
    pmean'd inside the step (real sync-BN).
  * For a ~45M-param CNN, TP/PP buy nothing (SURVEY.md §2.3) — replicated
    params + sharded batch is the bandwidth-optimal layout; collectives ride
    ICI via XLA.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None, axis: str = DATA_AXIS,
              *, local: bool = False) -> Mesh:
    """Device mesh over the first ``n_devices`` devices.

    ``local=True`` builds it from this process's addressable devices only —
    required for per-process work fed with host-local numpy arrays (e.g.
    data-parallel eval, where each process evaluates its own image shard):
    a global mesh would include devices this process cannot address and the
    jit would reject host-local inputs.  Training meshes stay global
    (batches assemble via make_array_from_process_local_data)."""
    devs = jax.local_devices() if local else jax.devices()
    if n_devices is not None:
        if local and n_devices > len(devs):
            raise ValueError(
                f"--ndev {n_devices} exceeds the {len(devs)} devices "
                f"addressable by process {jax.process_index()}; a "
                "per-process mesh cannot span hosts")
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def shard_train_step(step_fn, mesh: Mesh, axis: str = DATA_AXIS):
    """Wrap a per-replica train step for the mesh.

    step_fn must have been built with ``make_train_step(..., axis_name=axis)``
    so gradients/losses are psum'd and sync-BN sees the axis.  Returns a
    jitted fn with state replicated and batch sharded along ``axis``.
    """
    batch_spec = P(axis)
    mapped = shard_map(
        step_fn,
        mesh=mesh,
        in_specs=(P(), batch_spec, P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(mapped)


def shard_multi_train_step(multi_fn, mesh: Mesh, axis: str = DATA_AXIS,
                           *, donate: bool = False):
    """Mesh x scan: a ``make_multi_train_step`` program sharded over ``axis``.

    Batch leaves carry [n_steps, B, ...]; the scan axis stays unsharded
    (axis 0) and the batch axis is split over the mesh (axis 1), so one
    dispatch runs n_steps data-parallel steps with psum'd grads + sync-BN.
    ``donate=True`` reuses the state buffers in-place (training loop); leave
    off when the caller still needs the input state (tests).
    """
    mapped = shard_map(
        multi_fn,
        mesh=mesh,
        in_specs=(P(), P(None, axis), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(mapped, donate_argnums=(0,) if donate else ())


def put_scan_batch(batch, mesh: Mesh, axis: str = DATA_AXIS):
    """Device-put a stacked scan batch ([n_steps, B, ...] leaves): scan axis
    replicated, batch axis sharded."""
    return _put_sharded(batch, NamedSharding(mesh, P(None, axis)))


def make_sharded_predict(model, mesh: Mesh, axis: str = DATA_AXIS):
    """Data-parallel batched inference: batch sharded over ``axis``, params
    replicated, the whole decode+NMS pipeline partitioned by XLA (no
    collectives needed — detection is embarrassingly batch-parallel).

    Returns jitted ``fn(params, images, im_size) -> [B, keep_top_k, 6]``
    with B divisible by the mesh size.
    """
    from ..ops.module import Ctx

    def predict(params, images, im_size):
        return model.predict(params, images, im_size, Ctx(train=False))

    batch = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())
    return jax.jit(predict, in_shardings=(rep, batch, batch),
                   out_shardings=batch)


def put_replicated(tree, mesh: Mesh):
    return jax.device_put(tree, replicated(mesh))


def _put_sharded(tree, sharding: NamedSharding):
    """device_put with multi-host support: when the mesh spans processes,
    each process contributes its local batch slice and the result is the
    global array (jax.make_array_from_process_local_data)."""
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)), tree)
    return jax.device_put(tree, sharding)


def put_batch(batch, mesh: Mesh, axis: str = DATA_AXIS):
    return _put_sharded(batch, NamedSharding(mesh, P(axis)))
