"""Sharded training loop for FCN-LectureNet.

Reference training surface (lecturenet_train_00/01/02): SGD (momentum 0) with
per-phase learning rates/epochs from config, periodic backup checkpoints,
final state save. TPU-native execution: one jitted train step with donated
state, batch sharded over the mesh 'data' axis and conv channels over
'model' (parallel/mesh.py); BatchNorm batch stats are cross-replica via
flax's axis_name sync when data-parallel.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from functools import partial
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.config import Config
from ..models.fcn_lecturenet import FCNConfig, FCNLectureNet
from ..parallel.mesh import (make_mesh, MeshSpec, params_pspec_tree,
                             put_with_sharding)
from .losses import phase_losses


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


class Trainer:
    def __init__(self, model: FCNLectureNet, learning_rate: float,
                 momentum: float = 0.0, phase: str = "binarizer",
                 mesh: Optional[Mesh] = None, use_weights: bool = False,
                 freeze_bn: bool = False, clip_norm: Optional[float] = None,
                 fold_frozen_bn: bool = False, s2d_heads: bool = False,
                 prefetch_depth: int = 2):
        """freeze_bn mirrors the reference's warm-start behavior: the torch
        trainers call .eval() after loading a pretrained model and never
        switch back, so BatchNorm uses (and does not update) running stats
        for the whole phase (reference: lecturenet_train_01:106-122,
        train_02:164-188).

        fold_frozen_bn (freeze_bn phases only): fold the frozen BN affines
        into the conv kernels INSIDE the jitted step — running stats are
        frozen so the fold is exact for the forward; the original
        conv/BN parameters stay the gradient targets (autodiff flows
        through the per-channel fold). Removes every full-resolution BN
        elementwise pass from forward AND backward. s2d_heads additionally
        computes the k=7 full-res head convs in space-to-depth domain
        (crop must be a multiple of 32); its backward is the autodiff of
        the (linear) kernel remap — no custom VJP needed for parity.

        prefetch_depth: batches prepared ahead on a background thread
        during train_epoch (train/prefetch.py) so host decode/augment —
        and, single-process, the device upload — overlap device compute.
        The batch stream itself is unchanged (same RNG order); 0 restores
        fully synchronous loading (the reference's num_workers=0
        behavior, lecturenet_train_00:92-93). Measured on the TPU:
        never slower, up to +28% epoch wall at batch 8 when per-step
        host costs are on the critical path (PARITY.md "Host-side batch
        prefetching" — including the one-fetch-per-key epoch metrics
        that measurement motivated)."""
        self.model = model
        self.phase = phase
        self.mesh = mesh
        self.use_weights = use_weights
        self.freeze_bn = freeze_bn
        self.prefetch_depth = prefetch_depth
        transforms = []
        if clip_norm is not None:
            transforms.append(optax.clip_by_global_norm(clip_norm))
        transforms.append(optax.sgd(learning_rate, momentum=momentum))
        self.optimizer = optax.chain(*transforms)
        if (fold_frozen_bn or s2d_heads) and not freeze_bn:
            raise ValueError("fold_frozen_bn/s2d_heads require freeze_bn "
                             "(the fold is only exact with frozen stats)")
        self._train_step = make_train_step(model, self.optimizer, phase,
                                           use_weights, freeze_bn,
                                           fold_frozen_bn or s2d_heads,
                                           s2d_heads)

    # ------------------------------------------------------------- state

    def init_state(self, rng_key, sample_shape=(1, 256, 256, 3),
                   variables: Optional[Dict] = None) -> TrainState:
        if variables is None:
            from ..models.fcn_lecturenet import init_variables

            variables = init_variables(self.model, rng_key, sample_shape)
        params = variables["params"]
        batch_stats = variables["batch_stats"]
        state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                           batch_stats=batch_stats,
                           opt_state=self.optimizer.init(params))
        if self.mesh is not None:
            state = self.shard_state(state)
        return state

    def shard_state(self, state: TrainState) -> TrainState:
        mesh = self.mesh
        pspecs = params_pspec_tree(state.params, mesh)

        def put(tree, specs):
            # params/state: every host passes the SAME full arrays
            # (global_array contract — correct even when the 'model'
            # axis spans processes)
            return jax.tree.map(
                lambda v, s: put_with_sharding(v, NamedSharding(mesh, s),
                                               global_array=True),
                tree, specs)

        replicated = NamedSharding(mesh, P())
        return TrainState(
            step=put_with_sharding(state.step, replicated,
                                   global_array=True),
            params=put(state.params, pspecs),
            batch_stats=jax.tree.map(
                lambda v: put_with_sharding(v, replicated,
                                            global_array=True),
                state.batch_stats),
            opt_state=jax.tree.map(
                lambda v: put_with_sharding(v, replicated,
                                            global_array=True),
                state.opt_state),
        )

    def shard_batch(self, batch: Dict[str, np.ndarray]) -> Dict[str, Any]:
        """Callers always pass the GLOBAL batch. Multi-process runs (every
        host builds the same deterministic batch — the dataset RNG is
        seeded) slice this host's contiguous row share here before device
        placement, so each sample enters the global batch exactly once
        (host-local batching without a per-host data-loader split)."""
        if self.mesh is None:
            return {k: jnp.asarray(v) for k, v in batch.items()}
        if jax.process_count() > 1:
            from ..parallel.mesh import local_row_slice

            rows = local_row_slice(self.mesh,
                       len(next(iter(batch.values()))))
            batch = {k: np.asarray(v)[rows] for k, v in batch.items()}
        sharding = NamedSharding(self.mesh, P("data"))
        return {k: put_with_sharding(v, sharding) for k, v in batch.items()}

    # -------------------------------------------------------------- steps

    def step(self, state: TrainState, batch) -> tuple:
        return self._train_step(state, self.shard_batch(batch))

    def train_epoch(self, state: TrainState, dataset, batch_size: int):
        from .prefetch import prefetch

        # multi-process: global-array construction (shard_batch) must stay
        # on the main thread next to the other collectives, so the producer
        # prefetches host batches only; single-process it also uploads.
        device_side = jax.process_count() == 1
        batches = prefetch(dataset.batches(batch_size), self.prefetch_depth,
                           transform=self.shard_batch if device_side
                           else None)
        losses = []
        try:
            for batch in batches:
                if device_side:
                    state, metrics = self._train_step(state, batch)
                else:
                    state, metrics = self.step(state, batch)
                losses.append(metrics)
        finally:
            if hasattr(batches, "close"):
                batches.close()
        if not losses:
            return state, {}
        # one device->host transfer per metric key, not one per step: each
        # scalar fetch pays a full link round trip (~40-100 ms on a
        # tunneled rig), so stack the per-step scalars on device first
        mean = {k: float(np.mean(jax.device_get(
                    jnp.stack([m[k] for m in losses]))))
                for k in losses[0]}
        return state, mean

    # -------------------------------------------------------- checkpoints

    def save(self, state: TrainState, path: str) -> None:
        from ..pipeline.binarize import save_checkpoint_variables

        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        save_checkpoint_variables(
            {"params": jax.device_get(state.params),
             "batch_stats": jax.device_get(state.batch_stats)}, path)

    def load_variables(self, path: str):
        from ..pipeline.binarize import load_checkpoint_variables

        return load_checkpoint_variables(path)

    # full-state (params + batch stats + optimizer + step) checkpoints for
    # mid-training resume — the reference only saved model weights
    # (SURVEY.md §5: no optimizer-state or mid-epoch resume)

    def save_resume_checkpoint(self, state: TrainState, ckpt_dir: str) -> None:
        import orbax.checkpoint as ocp

        ckpt_dir = os.path.abspath(ckpt_dir)
        if os.path.exists(ckpt_dir):
            import shutil

            shutil.rmtree(ckpt_dir)
        checkpointer = ocp.StandardCheckpointer()
        checkpointer.save(ckpt_dir, jax.device_get(state))
        # StandardCheckpointer saves asynchronously; block so the checkpoint
        # is durable before we report the epoch as resumable
        checkpointer.wait_until_finished()

    def restore_resume_checkpoint(self, state_like: TrainState,
                                  ckpt_dir: str) -> TrainState:
        import orbax.checkpoint as ocp

        restored = ocp.StandardCheckpointer().restore(
            os.path.abspath(ckpt_dir), jax.device_get(state_like))
        if self.mesh is not None:
            restored = self.shard_state(restored)
        return restored


def make_train_step(model: FCNLectureNet, optimizer, phase: str,
                    use_weights: bool = False,
                    freeze_bn: bool = False,
                    fold_frozen_bn: bool = False,
                    s2d_heads: bool = False) -> Callable:
    fold_model = None
    if fold_frozen_bn:
        fold_model = FCNLectureNet(
            model.config, reconstruction_mode=model.reconstruction_mode,
            dtype=model.dtype, fold_bn=True, s2d_heads=s2d_heads)

    # donate the incoming state: params/opt buffers are consumed by the
    # update, so XLA reuses them in place instead of holding two copies
    # (matters at production widths — ~190MB of fp32 state per extra copy)
    @partial(jax.jit, donate_argnums=0)
    def train_step(state: TrainState, batch):
        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            if fold_model is not None:
                # frozen-BN fast path: traced per-channel fold (exact with
                # frozen stats; grads flow back through it), then the
                # BN-free (optionally s2d-heads) inference graph
                from ..models.fcn_lecturenet import fold_batch_norms

                folded = fold_batch_norms(variables, xp=jnp)
                outputs = fold_model.apply(folded, batch["image"],
                                           train=False)
                new_stats = state.batch_stats
            elif freeze_bn:
                outputs = model.apply(variables, batch["image"], train=False)
                new_stats = state.batch_stats
            else:
                outputs, updates = model.apply(variables, batch["image"],
                                               train=True,
                                               mutable=["batch_stats"])
                new_stats = updates["batch_stats"]
            terms = phase_losses(phase, outputs, batch, use_weights)
            total = sum(terms.values())
            return total, (terms, new_stats)

        (total, (terms, new_stats)), grads = \
            jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt_state = optimizer.update(grads, state.opt_state,
                                                  state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = dict(terms, total=total)
        return TrainState(step=state.step + 1, params=new_params,
                          batch_stats=new_stats,
                          opt_state=new_opt_state), metrics

    return train_step


# ---------------------------------------------------------------- phases

@dataclass
class PhaseSpec:
    """Per-phase config keys (reference: configs/FCN_LectureNet.conf:31-106)."""
    name: str
    lr_key: str
    epochs_key: str
    output_key: str
    default_lr: float
    default_epochs: int
    backup_every: int
    reconstruction_mode: bool


PHASES = {
    "reconstruction": PhaseSpec(
        "reconstruction", "FCN_BINARIZER_PRETRAIN_REC_LEARNING_RATE",
        "FCN_BINARIZER_PRETRAIN_REC_EPOCHS",
        "FCN_BINARIZER_PRETRAIN_RECONSTRUCTION_OUTPUT", 0.01, 100, 2, True),
    "text_detector": PhaseSpec(
        "text_detector", "FCN_BINARIZER_PRETRAIN_LEARNING_RATE",
        "FCN_BINARIZER_PRETRAIN_EPOCHS",
        "FCN_BINARIZER_PRETRAIN_TEXT_OUTPUT", 0.01, 100, 5, False),
    "binarizer": PhaseSpec(
        "binarizer", "FCN_BINARIZER_TRAIN_LEARNING_RATE",
        "FCN_BINARIZER_TRAIN_EPOCHS",
        "FCN_BINARIZER_TRAIN_OUTPUT", 0.001, 200, 5, False),
}


def reset_main_branches(variables, net_config: FCNConfig, rng_key):
    """Fresh-init the binarization + text-mask head parameters while keeping
    the trunk (reference: FCN_LectureNet.reset_main_branches,
    FCN_lecturenet.py:203-211 — used when warm-starting from the
    reconstruction pretrain)."""
    fresh = init_variables_for(net_config, rng_key)
    out = {"params": dict(variables["params"]),
           "batch_stats": dict(variables["batch_stats"])}
    for head in ("pixels_1", "pixels_2", "text_conv", "text_bn",
                 "out_conv", "out_bn"):
        out["params"][head] = fresh["params"][head]
        if head in fresh["batch_stats"]:
            out["batch_stats"][head] = fresh["batch_stats"][head]
    return out


def init_variables_for(net_config: FCNConfig, rng_key):
    from ..models.fcn_lecturenet import init_variables

    model = FCNLectureNet(net_config)
    return init_variables(model, rng_key,
                          (1, 32, 32, net_config.in_channels))


def run_phase(config: Config, phase_name: str, dataset,
              warm_start_path: Optional[str] = None,
              warm_start_is_reconstruction: bool = False,
              mesh_spec: Optional[MeshSpec] = None,
              epochs_override: Optional[int] = None,
              batch_size_override: Optional[int] = None,
              verbose: bool = True) -> str:
    """Run one curriculum phase end-to-end; returns the checkpoint path.

    Mirrors the reference trainers' flow: build/warm-start the model (with
    head reset when starting from the reconstruction pretrain, and BN
    frozen on any warm start), SGD over epochs with periodic .bak
    checkpoints, save the final state to the phase's configured output path.
    """
    spec = PHASES[phase_name]
    net_config = FCNConfig.from_config(config)
    # TRAIN_PRECISION = bf16 runs the forward/backward compute in bfloat16
    # with fp32 master params, optimizer state, losses, and BatchNorm
    # statistics (the model pins every BN and the losses cast to fp32).
    # fp32 is the default: it is bit-comparable to the reference torch
    # trainers (test_train_parity); bf16 is the TPU mixed-precision mode
    # (measured vs fp32 in BENCH_TRAIN.json; trajectory-bounded in
    # tests/test_training.py::test_bf16_training_tracks_fp32).
    precision = config.get_str("TRAIN_PRECISION", "fp32").lower()
    if precision in ("fp32", "float32"):
        dtype = jnp.float32
    elif precision in ("bf16", "bfloat16"):
        dtype = jnp.bfloat16
    else:
        raise ValueError(f"TRAIN_PRECISION must be fp32 or bf16, "
                         f"got {precision!r}")
    # TRAIN_BN_DTYPE = bf16 additionally computes the live-BN statistics
    # reduction + normalization in bfloat16 (running buffers stay fp32) —
    # only meaningful with TRAIN_PRECISION=bf16, where it keeps the
    # saved-for-backward BN activations in bf16 (VERDICT r4 item 4;
    # measured in BENCH_TRAIN.json bn_dtype rows, quality-tracked in
    # tests/test_training.py::test_bf16_bn_training_tracks_fp32).
    bn_precision = config.get_str("TRAIN_BN_DTYPE", "fp32").lower()
    if bn_precision in ("fp32", "float32"):
        bn_dtype = jnp.float32
    elif bn_precision in ("bf16", "bfloat16"):
        bn_dtype = jnp.bfloat16
    else:
        raise ValueError(f"TRAIN_BN_DTYPE must be fp32 or bf16, "
                         f"got {bn_precision!r}")
    # from-scratch (train-mode BN) phases default to the s2d training
    # forward (PhaseBatchNorm; 231 -> 293 img/s at batch 64 fp32 on v5e,
    # +78% at batch 8; torch step parity in test_train_parity).
    # TRAIN_S2D = 0 opts out; the model gate falls back to the plain path
    # automatically when the crop isn't 32-divisible or pixel_k < k.
    model = FCNLectureNet(net_config,
                          reconstruction_mode=spec.reconstruction_mode,
                          s2d_train=config.get_bool("TRAIN_S2D", True),
                          dtype=dtype, bn_dtype=bn_dtype)

    if warm_start_path is not None and not os.path.exists(warm_start_path):
        # a typo'd path must not silently fall back to from-scratch training
        # (warm_started also gates the frozen-BN semantics); the reference
        # crashes in torch.load here (lecturenet_train_02:173). Checked
        # BEFORE joining any multi-host mesh: a host missing the file must
        # fail fast and consistently, not raise mid-collectives while its
        # peers proceed (Gloo's rendezvous deadline would bury this error
        # under a barrier failure).
        raise FileNotFoundError(
            f"[{phase_name}] warm-start checkpoint not found: "
            f"{warm_start_path} — run the pretraining phase first or unset "
            "the USE_*_OUTPUT config key")

    if mesh_spec is not None:
        from ..parallel.mesh import (initialize_distributed_from_env,
                                     warmup_collectives)

        initialize_distributed_from_env()  # multi-host: join before devices
        mesh = make_mesh(mesh_spec)
        warmup_collectives(mesh)  # pre-create cross-process communicators
    else:
        mesh = None
    lr = config.get_float(spec.lr_key, spec.default_lr)
    epochs = epochs_override or config.get_int(spec.epochs_key,
                                               spec.default_epochs)
    if batch_size_override is not None:
        batch_size = batch_size_override
    elif phase_name == "binarizer":
        batch_size = config.get_int("FCN_BINARIZER_TRAIN_BATCH_SIZE", 8)
    else:
        batch_size = config.get_int("FCN_BINARIZER_PRETRAIN_BATCH_SIZE", 8)

    variables = None
    warm_started = False
    if warm_start_path is not None:
        from ..pipeline.binarize import load_checkpoint_variables

        variables = load_checkpoint_variables(warm_start_path)
        warm_started = True
        if warm_start_is_reconstruction:
            variables = reset_main_branches(variables, net_config,
                                            jax.random.PRNGKey(1))
        if verbose:
            print(f"[{phase_name}] warm start from {warm_start_path}"
                  f"{' (heads reset)' if warm_start_is_reconstruction else ''}")

    # warm-start phases run the frozen-BN fast path by default: traced BN
    # folding + s2d-domain head convs (exact graph rewrites, parity-tested
    # in test_train_parity; measured 278 -> 374 img/s at batch 64 fp32 on
    # v5e — 16.8% train MFU). TRAIN_FROZEN_FAST = 0 restores the plain path.
    crop = config.get("FCN_BINARIZER_TRAIN_CROP_SIZE", (256, 256))
    frozen_fast = warm_started and config.get_bool("TRAIN_FROZEN_FAST", True)
    s2d_ok = (frozen_fast and crop[0] % 32 == 0 and crop[1] % 32 == 0
              and net_config.pixel_kernel_size >= net_config.kernel_size)
    trainer = Trainer(model, lr, phase=phase_name, mesh=mesh,
                      freeze_bn=warm_started, fold_frozen_bn=frozen_fast,
                      s2d_heads=s2d_ok,
                      prefetch_depth=config.get_int(
                          "TRAIN_PREFETCH_BATCHES", 2))

    state = trainer.init_state(jax.random.PRNGKey(0),
                               (1, crop[0], crop[1], net_config.in_channels),
                               variables)

    out_path = config.get_str(spec.output_key,
                              f"models/lecturenet_{phase_name}.msgpack")

    # resume from a full-state checkpoint if one exists
    import json

    resume_dir = out_path + ".resume"
    meta_path = resume_dir + ".json"
    start_epoch = 0
    if os.path.isdir(resume_dir) and os.path.exists(meta_path):
        with open(meta_path) as f:
            start_epoch = json.load(f)["completed_epochs"]
        state = trainer.restore_resume_checkpoint(state, resume_dir)
        if verbose:
            print(f"[{phase_name}] resumed after epoch {start_epoch}")

    for epoch in range(start_epoch, epochs):
        state, metrics = trainer.train_epoch(state, dataset, batch_size)
        if verbose:
            printable = ", ".join(f"{k}={v:.5f}" for k, v in metrics.items())
            print(f"[{phase_name}] epoch {epoch + 1}/{epochs}: {printable}")
        if (epoch + 1) % spec.backup_every == 0:
            trainer.save(state, out_path + f".epoch_{epoch + 1}.bak")
            trainer.save_resume_checkpoint(state, resume_dir)
            with open(meta_path, "w") as f:
                json.dump({"completed_epochs": epoch + 1}, f)

    trainer.save(state, out_path)
    return out_path
