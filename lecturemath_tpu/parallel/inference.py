"""Multi-chip frame-sharded inference.

Frames are embarrassingly parallel through the FCN forward, so the batch
axis shards over the mesh 'data' axis (params replicated, or channel-sharded
over 'model' for very large variants); XLA/GSPMD inserts the collectives.
For few huge frames (batch smaller than the chip count — e.g. one 4K
board scan) the HEIGHT axis additionally shards over the 'model' axis
(``shard_spatial``): GSPMD spatially partitions every conv and inserts
the halo exchanges, bit-identical to the unsharded forward (the CNN
analog of sequence/context parallelism). This replaces nothing in the
reference — it was single-GPU batch-1 (SURVEY.md §2.11) — and is the
natural TPU pod scaling path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.fcn_lecturenet import (FCNLectureNet, pad_to_multiple,
                                     prepare_images)
from .mesh import params_pspec_tree


class ShardedBinarizer:
    """Batched binarizer with the frame axis sharded across chips.

    The per-chip sub-batch must divide evenly: callers pass batches of size
    k * mesh.data. Use together with pipeline.video.FrameBatch padding.

    ``shard_spatial=True`` additionally shards the image HEIGHT axis over
    the mesh 'model' axis (mutually exclusive with
    ``shard_params_over_model``, which uses that axis for channels).
    GSPMD spatially partitions the convs with halo exchanges —
    bit-identical to the unsharded forward (asserted in
    test_parallel.test_spatial_sharded_matches_plain); heights are padded
    to divide evenly across the shards before device placement.
    """

    def __init__(self, model: FCNLectureNet, variables, mesh: Mesh,
                 force_binary: bool = True, threshold: int = 128,
                 shard_params_over_model: bool = False,
                 shard_spatial: bool = False):
        if shard_params_over_model and shard_spatial:
            raise ValueError("shard_params_over_model and shard_spatial "
                             "both use the mesh 'model' axis — pick one")
        self.model = model
        self.mesh = mesh
        self.force_binary = force_binary
        self.threshold = threshold
        self.shard_spatial = shard_spatial

        if shard_params_over_model:
            specs = params_pspec_tree(variables["params"], mesh)
            params = jax.tree.map(
                lambda v, s: jax.device_put(v, NamedSharding(mesh, s)),
                variables["params"], specs)
        else:
            params = jax.tree.map(
                lambda v: jax.device_put(v, NamedSharding(mesh, P())),
                variables["params"])
        stats = jax.tree.map(
            lambda v: jax.device_put(v, NamedSharding(mesh, P())),
            variables["batch_stats"])
        self.variables = {"params": params, "batch_stats": stats}

        self._batch_sharding = NamedSharding(
            mesh, P("data", "model") if shard_spatial else P("data"))

        @jax.jit
        def binarize(variables, rgb_uint8):
            x = prepare_images(rgb_uint8)
            x, (h, w) = pad_to_multiple(x)
            bin_logits, text_logits, _ = model.apply(variables, x, train=False)
            bin_prob = jax.nn.sigmoid(bin_logits[..., 0].astype(jnp.float32))
            bin_u8 = (bin_prob * 255.0).astype(jnp.uint8)
            if force_binary:
                bin_u8 = jnp.where(bin_u8 >= threshold, 255, 0).astype(jnp.uint8)
            return bin_u8[:, :h, :w]

        self._binarize = binarize

    def binarize_frames(self, frames: np.ndarray) -> np.ndarray:
        """uint8 [B, H, W, 3] with B divisible by mesh 'data' size."""
        data_size = self.mesh.shape["data"]
        batch = frames.shape[0]
        if batch % data_size:
            pad = data_size - batch % data_size
            frames = np.concatenate([frames,
                                     np.repeat(frames[-1:], pad, axis=0)])
        height = frames.shape[1]
        if self.shard_spatial:
            # the raw height must divide across the 'model' shards at
            # device placement; edge-pad to lcm(32, model) with the SAME
            # scheme pad_to_multiple uses inside the jit (which then
            # becomes a no-op), so the padded input — and therefore the
            # output — is bit-identical to the batch-only path's
            unit = int(np.lcm(32, self.mesh.shape["model"]))
            if height % unit:
                pad_h = unit - height % unit
                frames = np.pad(frames, ((0, 0), (0, pad_h), (0, 0),
                                         (0, 0)), mode="edge")
        device_batch = jax.device_put(frames, self._batch_sharding)
        out = self._binarize(self.variables, device_batch)
        return np.asarray(jax.device_get(out))[:batch, :height]
