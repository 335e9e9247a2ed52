"""Device mesh + GSPMD sharding helpers.

The reference is strictly single-device (SURVEY.md §2.11); here data
parallelism is the first-class default: batch dims shard over the mesh 'data'
axis, parameters/optimizer state replicate, and XLA inserts the psum/all-gather
collectives over ICI. The same helpers drive the descriptor-extraction and
ranking-matmul sharding for eval (scores = V.T @ Q sharded over queries).
"""
import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices=None, axis="data", devices=None):
    devices = devices if devices is not None else jax.devices()
    if n_devices:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh, axis="data"):
    """Shard the leading (batch) dim over the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh):
    return NamedSharding(mesh, P())


def shard_batch(mesh, *arrays, axis="data"):
    """Device_put arrays with their leading dim sharded over the mesh."""
    sh = batch_sharding(mesh, axis)
    out = tuple(jax.device_put(a, sh) for a in arrays)
    return out if len(out) > 1 else out[0]


def replicate_tree(mesh, tree):
    """Fully replicate a pytree (params/optimizer state) over the mesh."""
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def data_parallel_step(step_fn, mesh, axis="data", num_batch_args=None):
    """Wrap a `(state, *batches) -> (state, ...)` step for the mesh: state
    replicated, EVERY batch arg sharded on its leading dim (the explicit
    device_puts below establish the shardings; `num_batch_args` is accepted
    for caller symmetry but unused). XLA all-reduces the gradients (GSPMD) —
    no explicit collectives needed."""
    del num_batch_args
    rep = replicated(mesh)
    bsh = batch_sharding(mesh, axis)
    jitted = jax.jit(step_fn)

    def wrapped(state, *batches):
        # replicate the state on entry: a checkpoint-resumed state arrives as
        # host arrays; device_put with the same sharding is a no-op for the
        # already-replicated steady-state case
        state = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, rep) if hasattr(x, "dtype") else x,
            state)
        batches = tuple(jax.device_put(b, bsh) for b in batches)
        return jitted(state, *batches)

    wrapped.gandtr_dp = True  # build.py gates dispatch_chunk off this
    return wrapped


def spatial_mesh(n_data, n_sp, devices=None, axes=("data", "sp")):
    """Sanctioned constructor for a 2-D data×spatial mesh.

    Spatial (image-dim) sharding of conv stacks is numerically hazardous in
    two ways on the current XLA SPMD partitioner (jax 0.9.0), both producing
    SILENTLY wrong values, so this helper enforces the safe configuration:

    1. The fastconv strided-conv rewrites (ops/fastconv.py conv_s2d: stride-s
       conv + depth_to_space) partition incorrectly whenever the window grid
       crosses spatial shard boundaries unaligned — measured maxdiff ~10 on
       the first HED conv (vs 1e-6 for every plain conv). This helper
       therefore disables fastconv process-wide; re-enable explicitly via
       `fastconv.set_enabled(True)` only after dropping spatial shardings.
       (fastconv targets MXU lane-filling on a single chip; under spatial
       sharding the lanes are a per-shard concern anyway.)
    2. Halo exchange breaks when a layer's spatial shard becomes smaller than
       its conv halo (deep feature maps: a 3×3 conv on a 2-row map sharded
       4-way diverges by ~0.13). Validate the shard count against the model's
       total downsampling with `max_spatial_shards` before picking n_sp.

    tests/test_spatial_sharding.py pins both hazards and the safe-path
    equality vs replicated execution.
    """
    from gandtr_tpu.ops import fastconv
    fastconv.set_enabled(False)
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= n_data * n_sp
    return Mesh(np.asarray(devices[:n_data * n_sp]).reshape(n_data, n_sp),
                axes)


def max_spatial_shards(image_hw, total_downsample, max_halo=2):
    """Largest spatial shard count that keeps every layer's shard at least as
    wide as its conv halo (hazard 2 in `spatial_mesh`): the deepest feature
    map has image_hw/total_downsample rows, and each of the n_sp shards must
    hold >= max_halo of them. Returns at least 1.

    E.g. HED (16× downsampling, 3×3 convs → halo 2) at 64px: deepest map has
    4 rows, so at most 2 shards.
    """
    deepest = image_hw // total_downsample
    n = max(deepest // max_halo, 1)
    # shard counts must divide the ORIGINAL image dim for even sharding
    while n > 1 and image_hw % n:
        n -= 1
    return n


def init_distributed(coordinator_address=None, num_processes=None,
                     process_id=None):
    """Multi-host initialization (SURVEY.md §5.8): call once per host before
    device use; afterwards `jax.devices()` spans the slice and `make_mesh`
    builds the global mesh. On single-host setups this is a no-op.

    Collectives ride ICI within a slice and DCN across slices — XLA picks the
    transport from the mesh topology; nothing framework-side to configure.
    """
    import jax
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def process_local_batch(global_batch, axis="data"):
    """Per-process slice size for a host-sharded input pipeline."""
    import jax
    assert global_batch % jax.process_count() == 0
    return global_batch // jax.process_count()


def global_batch_array(mesh, local, axis="data"):
    """Assemble a globally-sharded batch from this process's local shard.

    Multi-host JAX cannot `device_put` a host array onto devices of other
    processes: each process loads its own slice of the batch (rows
    [process_index * local_batch, ...)) and this wraps them into one global
    jax.Array sharded over the mesh axis. Single-process: plain device_put
    (identical semantics, zero overhead path).

    tests/test_multihost.py drives this across real separate processes with
    gloo collectives on CPU.
    """
    sh = NamedSharding(mesh, P(axis))
    if jax.process_count() == 1:
        return jax.device_put(local, sh)
    return jax.make_array_from_process_local_data(sh, local)
