"""Device mesh + sharding layout for multi-chip runs.

The reference is single-process / single-GPU (SURVEY.md §2.11); the natural
TPU scaling axes here are:

  * ``data``  — batch/frame axis. Frames of a lecture are embarrassingly
    parallel through the FCN forward; training batches shard the same way.
  * ``model`` — channel axis of the conv stacks (tensor parallelism). Conv
    kernels shard on output channels; GSPMD inserts the all-gathers /
    reduce-scatters on ICI.

Spatial (H) sharding for very large frames rides the same ``model`` axis via
GSPMD conv spatial partitioning when requested (see parallel/inference.py).
"""

from __future__ import annotations

import math

from dataclasses import dataclass
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclass(frozen=True)
class MeshSpec:
    data: int = -1   # -1: all remaining devices
    model: int = 1

    def resolve(self, n_devices: Optional[int] = None) -> "MeshSpec":
        n = n_devices if n_devices is not None else len(jax.devices())
        model = max(1, self.model)
        data = self.data if self.data > 0 else max(1, n // model)
        if data * model > n:
            raise ValueError(f"mesh {data}x{model} needs {data * model} "
                             f"devices, have {n}")
        return MeshSpec(data, model)


def parse_mesh_arg(text) -> MeshSpec:
    """Parse a user-facing mesh request: 'D', 'DxM', or 'auto' (all devices
    on the data axis). Used by the -mesh CLI flag and the TPU_MESH config
    key. Raises a usage-style ValueError on malformed input (bare -mesh
    flag, multiple tokens, non-numeric)."""
    usage = (f"invalid mesh request {text!r}: expected 'D', 'DxM', or "
             f"'auto' (e.g. -mesh 4x2)")
    if isinstance(text, (bool, list, tuple)):
        raise ValueError(usage)
    text = str(text).strip().lower()
    if text in ("auto", "all", "-1"):
        return MeshSpec()
    parts = text.split("x")
    try:
        data = int(parts[0])
        model = int(parts[1]) if len(parts) > 1 else 1
    except (ValueError, IndexError):
        raise ValueError(usage) from None
    if len(parts) > 2 or data < 1 or model < 1:
        raise ValueError(usage)
    return MeshSpec(data=data, model=model)


def mesh_spec_from(params=None, config=None) -> Optional[MeshSpec]:
    """Resolve a mesh request from CLI params ('-mesh DxM', wins) or the
    TPU_MESH config key; None when neither asks for a mesh."""
    value = None
    if params:
        value = params.get("mesh")
    if value is None and config is not None:
        value = config.get("TPU_MESH", None)
    if value in (None, "", 0, "0", "none", "1", 1):
        return None
    return parse_mesh_arg(value)


def make_mesh(spec: MeshSpec = MeshSpec(), devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    spec = spec.resolve(len(devices))
    grid = np.asarray(devices[:spec.data * spec.model]).reshape(
        spec.data, spec.model)
    return Mesh(grid, axis_names=("data", "model"))


def put_with_sharding(x: Any, sharding: NamedSharding,
                      global_array: bool = False) -> Any:
    """Place one host array under a (possibly multi-process) sharding.

    Single-process: plain device_put. Multi-process (jax.distributed
    initialized, process_count > 1), two caller contracts:

    * ``global_array=False`` (batches): the caller passes its
      PROCESS-LOCAL portion — the rows of a 'data'-sharded batch this
      host owns — and jax.make_array_from_process_local_data assembles
      the global array (host-local batching; no host ever materializes
      the global batch).
    * ``global_array=True`` (params / replicated state): every host
      passes the SAME full array and each provides its addressable
      shards by slicing it — correct for replicated specs AND for
      sharded axes that span processes (e.g. channel-'model' sharding
      on a tp-across-hosts mesh, where the local-chunk contract above
      would silently double the axis)."""
    if jax.process_count() > 1:
        x = np.asarray(x)
        if global_array:
            return jax.make_array_from_callback(
                np.shape(x), sharding, lambda idx: x[idx])
        return jax.make_array_from_process_local_data(sharding, x)
    return jax.device_put(x, sharding)


def local_row_slice(mesh: Mesh, n_rows: int) -> slice:
    """The contiguous batch-row range this process owns under a
    'data'-major mesh built from jax.devices() (process devices are
    contiguous in enumeration order). The slice covers exactly the
    'data'-axis positions this process's devices address: with the data
    axis partitioned across P processes that is rows [i*n/P, (i+1)*n/P);
    with a data axis SMALLER than the process count (e.g. a tp-only
    -mesh 1xM on a pod) processes share data positions and must feed the
    SAME rows, so the slice widens accordingly — feeding per-process
    halves there would assemble a silently inconsistent global array.
    Lets every host hold the SAME global batch and feed only its share
    (each sample enters the global batch once)."""
    data_size = mesh.shape["data"]
    model_size = math.prod(s for name, s in mesh.shape.items()
                           if name != "data")
    count = jax.process_count()
    index = jax.process_index()
    if n_rows % data_size:
        raise ValueError(f"batch of {n_rows} rows does not divide across "
                         f"the {data_size}-way data axis")
    # the contiguous-enumeration math below is only valid when the mesh
    # spans every process's devices; a sub-mesh (e.g. -mesh 1x1 on a
    # 2-host pod) would leave some processes owning no mesh devices and
    # silently assign rows to hosts whose devices are not in the mesh
    n_mesh_devices = data_size * model_size
    if n_mesh_devices % count or n_mesh_devices != jax.device_count():
        raise ValueError(
            f"multi-process run: the {data_size}x{model_size} mesh must "
            f"span all {jax.device_count()} devices across the {count} "
            f"processes (sub-meshes cannot be row-partitioned)")
    per_process = n_mesh_devices // count
    first_data = (index * per_process) // model_size
    last_data = ((index + 1) * per_process - 1) // model_size
    rows_per_shard = n_rows // data_size
    return slice(first_data * rows_per_shard,
                 (last_data + 1) * rows_per_shard)


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Put a host batch (or pytree of arrays) with leading batch axis onto
    the mesh, sharded over 'data'. In multi-process runs each process
    passes its local batch rows (see put_with_sharding)."""
    sharding = NamedSharding(mesh, P("data"))
    return jax.tree.map(lambda x: put_with_sharding(x, sharding), batch)


def _param_spec(path_leaf: str, value) -> P:
    """Partition spec for one parameter.

    Conv kernels (kh, kw, in, out) and ConvTranspose kernels shard the output
    -channel (last) axis over 'model' when it divides evenly; 1-D params
    (bias, BN scale/bias/mean/var) shard the same axis. Everything else
    replicates.
    """
    shape = np.shape(value)
    if len(shape) == 0:
        return P()
    return P(*([None] * (len(shape) - 1) + ["model"]))


def params_pspec_tree(params: Any, mesh: Mesh) -> Any:
    """PartitionSpec tree for a parameter pytree: shard the trailing
    (channel) axis over 'model' where it divides; replicate otherwise."""
    model_size = mesh.shape["model"]

    def spec_for(value):
        shape = np.shape(value)
        if len(shape) >= 1 and shape[-1] % model_size == 0 and shape[-1] >= model_size:
            return _param_spec("", value)
        return P()

    return jax.tree.map(spec_for, params)


def shard_params(mesh: Mesh, params: Any) -> Any:
    """Place a parameter pytree on the mesh with channel-dim tensor
    parallelism over 'model' (replicated over 'data')."""
    specs = params_pspec_tree(params, mesh)
    return jax.tree.map(
        lambda value, spec: put_with_sharding(value,
                                              NamedSharding(mesh, spec),
                                              global_array=True),
        params, specs)


def replicate(mesh: Mesh, tree: Any) -> Any:
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: put_with_sharding(x, sharding,
                                                    global_array=True),
                        tree)


def warmup_collectives(mesh: Mesh) -> None:
    """Establish every cross-process communicator the mesh's collectives
    will use, up front, with a trivial program.

    Communicator creation is lazy (first collective over a device group
    does a key-value rendezvous through the coordination service) and the
    rendezvous has a hard ~30 s deadline — far shorter than a large jit
    compile. If one host finishes compiling a big step and dispatches its
    first collective while a peer is still compiling, the rendezvous times
    out and the job dies. Running per-axis + global psums from a program
    that compiles in seconds creates all the device-group contexts while
    host skew is still small; the big steps then reuse them, and peers can
    lag each other by whole compile times without a rendezvous in flight.

    No-op single-process (groups are intra-process, rendezvous is local)."""
    if jax.process_count() <= 1:
        return
    from functools import partial

    from jax import lax
    from jax.experimental.shard_map import shard_map

    @jax.jit
    @partial(shard_map, mesh=mesh, in_specs=P("data", "model"),
             out_specs=P())
    def _warm(v):
        return (lax.psum(lax.psum(v, "data"), "model")
                + lax.psum(v, ("data", "model")))

    x = np.zeros((mesh.shape["data"], mesh.shape["model"]), np.float32)
    out = _warm(put_with_sharding(x, NamedSharding(mesh, P("data",
                                                           "model")),
                                  global_array=True))
    # fetch the (already reduced) scalar rather than block_until_ready:
    # through the axon tunnel block_until_ready is a measured no-op (see
    # CLAUDE.md), and the whole point here is to NOT return before the
    # warm-up collectives' communicator rendezvous has completed
    jax.device_get(out)


def initialize_distributed_from_env() -> bool:
    """Join a multi-process (multi-host) mesh when the LM_COORDINATOR /
    LM_NUM_PROCESSES / LM_PROCESS_ID environment variables are set; no-op
    otherwise. Returns True when running multi-process. Call before any
    device use — jax.distributed.initialize must precede backend init.

    This is the DCN-facing entry point: on a TPU pod slice each host runs
    the same CLI with its own LM_PROCESS_ID and jax assembles the global
    device mesh (collectives ride ICI within a slice, DCN across hosts).
    On CPU it uses the Gloo backend — the multi-process tests exercise the
    same code path with 2 processes x 4 virtual devices."""
    import os

    coordinator = os.environ.get("LM_COORDINATOR")
    if not coordinator:
        return jax.process_count() > 1
    # idempotent: chained phases / repeated CLI mesh resolution must not
    # re-initialize (jax.distributed.initialize raises on a second call)
    try:
        from jax._src import distributed as _dist

        if _dist.global_state.client is not None:
            return True
    except (ImportError, AttributeError):
        pass
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=int(os.environ["LM_NUM_PROCESSES"]),
        process_id=int(os.environ["LM_PROCESS_ID"]))
    return True


def shutdown_distributed() -> bool:
    """Cleanly leave a multi-process mesh: barrier all hosts, then shut
    the distributed client down. No-op (False) when not running
    multi-process.

    Without the barrier, hosts that finish at different times (lecture
    skew, compile skew) hit the distributed service's ~30 s shutdown
    deadline and die with a barrier timeout — observed on this rig. Every
    CLI that joins via initialize_distributed_from_env calls this on the
    way out."""
    if not jax.distributed.is_initialized():
        return False
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("lm_cli_done")
    jax.distributed.shutdown()
    return True
