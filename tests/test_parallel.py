"""Mesh construction, param sharding, and sharded inference on the virtual
8-device CPU backend."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lecturemath_tpu.models.fcn_lecturenet import (FCNConfig, FCNLectureNet,
                                                   init_variables)
from lecturemath_tpu.parallel.inference import ShardedBinarizer
from lecturemath_tpu.parallel.mesh import (MeshSpec, make_mesh,
                                           params_pspec_tree, shard_batch)

SHARDY = FCNConfig(down_filters=(8, 8, 16, 16, 16), mid_filters=16,
                   upsample_filters=(8, 8, 8, 16, 16),
                   up_filters=(8, 8, 8, 16, 16), pixel_features=(8, 8),
                   kernel_size=3, pixel_kernel_size=3)


def test_mesh_spec_resolution():
    assert MeshSpec(-1, 1).resolve(8) == MeshSpec(8, 1)
    assert MeshSpec(-1, 2).resolve(8) == MeshSpec(4, 2)
    with pytest.raises(ValueError):
        MeshSpec(8, 2).resolve(8)


def test_make_mesh_and_shard_batch():
    mesh = make_mesh(MeshSpec(data=4, model=2))
    assert dict(mesh.shape) == {"data": 4, "model": 2}

    batch = np.zeros((8, 16, 16, 3), np.float32)
    sharded = shard_batch(mesh, batch)
    assert sharded.sharding.spec == jax.sharding.PartitionSpec("data")


def test_param_pspec_tree():
    mesh = make_mesh(MeshSpec(data=4, model=2))
    params = {"conv": {"kernel": np.zeros((3, 3, 8, 16)),
                       "bias": np.zeros(16)},
              "odd": {"kernel": np.zeros((3, 3, 4, 5))}}
    specs = params_pspec_tree(params, mesh)
    assert specs["conv"]["kernel"] == jax.sharding.PartitionSpec(
        None, None, None, "model")
    assert specs["conv"]["bias"] == jax.sharding.PartitionSpec("model")
    # 5 not divisible by 2 -> replicated
    assert specs["odd"]["kernel"] == jax.sharding.PartitionSpec()


def test_mesh_arg_parsing():
    from lecturemath_tpu.parallel.mesh import mesh_spec_from, parse_mesh_arg

    assert parse_mesh_arg("4x2") == MeshSpec(4, 2)
    assert parse_mesh_arg("8") == MeshSpec(8, 1)
    assert parse_mesh_arg("auto") == MeshSpec()

    assert mesh_spec_from({"mesh": "4x2"}, None) == MeshSpec(4, 2)
    assert mesh_spec_from({}, None) is None
    assert mesh_spec_from(None, None) is None

    class FakeConfig:
        def get(self, key, default=None):
            return {"TPU_MESH": "8x1"}.get(key, default)

    assert mesh_spec_from({}, FakeConfig()) == MeshSpec(8, 1)
    assert mesh_spec_from({"mesh": "2x4"}, FakeConfig()) == MeshSpec(2, 4)


@pytest.mark.parametrize("mesh_shape", [(8, 1), (4, 2)])
def test_binarizer_mesh_parity(mesh_shape):
    """The production Binarizer with a mesh (the -mesh CLI path) produces
    the same frames as the single-device path, for both dp-only and dp x tp
    layouts, through the packed streaming pipeline."""
    from lecturemath_tpu.pipeline.binarize import Binarizer
    from lecturemath_tpu.pipeline.video import ArraySource

    model = FCNLectureNet(SHARDY)
    variables = init_variables(model, jax.random.PRNGKey(0), (1, 32, 32, 3))

    rng = np.random.default_rng(1)
    frames = rng.integers(0, 256, (11, 32, 64, 3), np.uint8)  # ragged tail

    plain = Binarizer(model, variables, batch_size=4)
    _, _, expected = plain.process_source(ArraySource(frames, fps=1.0))

    mesh = make_mesh(MeshSpec(*mesh_shape))
    meshed = Binarizer(model, variables, batch_size=4, mesh=mesh)
    assert meshed.batch_size % mesh.shape["data"] == 0
    times, indices, got = meshed.process_source(ArraySource(frames, fps=1.0))

    assert len(got) == len(expected) == 11
    for a, b in zip(expected, got):
        np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("shard_model", [False, True])
def test_sharded_binarizer(shard_model):
    mesh = make_mesh(MeshSpec(data=4, model=2))
    model = FCNLectureNet(SHARDY)
    variables = init_variables(model, jax.random.PRNGKey(0), (1, 32, 32, 3))
    binarizer = ShardedBinarizer(model, variables, mesh,
                                 shard_params_over_model=shard_model)

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, (8, 32, 32, 3), np.uint8)
    out = binarizer.binarize_frames(frames)
    assert out.shape == (8, 32, 32)
    assert set(np.unique(out).tolist()) <= {0, 255}

    # non-divisible batch pads internally and crops back
    out_small = binarizer.binarize_frames(frames[:5])
    assert out_small.shape == (5, 32, 32)
    np.testing.assert_array_equal(out_small, out[:5])


@pytest.mark.slow
def test_production_width_tensor_parallel_step():
    """dp x tp train step at the REAL channel widths (48..768) on the
    virtual 8-device mesh: validates pspec/divisibility behavior at the
    widths a pod would run (VERDICT r2 item 7). Tiny spatial dims keep the
    compile cheap; the compile cache makes re-runs fast."""
    import numpy as np

    from lecturemath_tpu.models.fcn_lecturenet import FCNConfig, FCNLectureNet
    from lecturemath_tpu.parallel.mesh import MeshSpec, make_mesh
    from lecturemath_tpu.train.trainer import Trainer

    mesh = make_mesh(MeshSpec(data=4, model=2), devices=jax.devices()[:8])
    model = FCNLectureNet(FCNConfig())  # production 48..768
    trainer = Trainer(model, learning_rate=1e-3, phase="binarizer", mesh=mesh)
    state = trainer.init_state(jax.random.PRNGKey(0), (1, 32, 32, 3))

    # the 768-ch mid kernel must actually shard over 'model'
    assert "model" in state.params["mid"]["conv"]["kernel"].sharding.spec

    rng = np.random.default_rng(0)
    batch = {
        "image": rng.normal(0, 1, (4, 32, 32, 3)).astype(np.float32),
        "target": (rng.random((4, 32, 32, 1)) > 0.5).astype(np.float32),
        "text_mask": (rng.random((4, 32, 32, 1)) > 0.5).astype(np.float32),
    }
    state, metrics = trainer.step(state, batch)
    assert np.isfinite(float(jax.device_get(metrics["total"])))


def test_mesh_with_yuv_upload():
    """Frame-sharded mesh inference composes with YUV420 uploads: planes
    shard over 'data' and results match the unsharded yuv path exactly."""
    import numpy as np

    from lecturemath_tpu.parallel.mesh import MeshSpec, make_mesh
    from lecturemath_tpu.pipeline.binarize import Binarizer
    from lecturemath_tpu.pipeline.video import ArraySource
    from lecturemath_tpu.utils.synthetic import (
        synthetic_rgb_lecture, threshold_binarizer_variables)

    config = FCNConfig(down_filters=(4, 6, 8, 10, 12), mid_filters=12,
                       upsample_filters=(3, 4, 6, 8, 10),
                       up_filters=(4, 5, 6, 8, 10), pixel_features=(5, 4),
                       kernel_size=3, pixel_kernel_size=3)
    model = FCNLectureNet(config, dtype=jnp.bfloat16)
    variables = threshold_binarizer_variables(config)
    rgb, _, _, _ = synthetic_rgb_lecture(seed=13, n_frames=8, height=96,
                                         width=128)

    mesh = make_mesh(MeshSpec(data=4, model=1), devices=jax.devices()[:4])
    sharded = Binarizer(model, variables, batch_size=4, mesh=mesh,
                        upload_format="yuv420")
    plain = Binarizer(model, variables, batch_size=4,
                      upload_format="yuv420")
    assert sharded.upload_format == "yuv420"

    _, _, a = sharded.process_source(ArraySource(rgb, fps=1.0))
    _, _, b = plain.process_source(ArraySource(rgb, fps=1.0))
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_local_row_slice_covers_addressable_data_positions(monkeypatch):
    """local_row_slice must widen to the FULL batch when the data axis is
    replicated across processes (e.g. a tp-only 1xM mesh on 2 hosts) —
    per-host halves there would assemble an inconsistent global array —
    and split contiguously when the data axis spans the processes."""
    import jax

    from lecturemath_tpu.parallel.mesh import (MeshSpec, local_row_slice,
                                               make_mesh)

    def fake(count, index):
        monkeypatch.setattr(jax, "process_count", lambda: count)
        monkeypatch.setattr(jax, "process_index", lambda: index)

    # data axis spans processes: contiguous halves
    mesh = make_mesh(MeshSpec(data=8, model=1))
    fake(2, 0)
    assert local_row_slice(mesh, 16) == slice(0, 8)
    fake(2, 1)
    assert local_row_slice(mesh, 16) == slice(8, 16)

    # tp-only mesh: data axis replicated -> every host feeds ALL rows
    mesh = make_mesh(MeshSpec(data=1, model=8))
    for index in (0, 1):
        fake(2, index)
        assert local_row_slice(mesh, 6) == slice(0, 6)

    # mixed dp x tp across 2 hosts: each host owns half the data axis
    mesh = make_mesh(MeshSpec(data=4, model=2))
    fake(2, 0)
    assert local_row_slice(mesh, 8) == slice(0, 4)
    fake(2, 1)
    assert local_row_slice(mesh, 8) == slice(4, 8)

    # more processes than data shards: processes sharing a data position
    # feed the SAME rows
    mesh = make_mesh(MeshSpec(data=2, model=4))
    expected = [slice(0, 2), slice(0, 2), slice(2, 4), slice(2, 4)]
    for index in range(4):
        fake(4, index)
        assert local_row_slice(mesh, 4) == expected[index]

    # rows must divide the data axis, not the process count
    fake(2, 0)
    mesh = make_mesh(MeshSpec(data=8, model=1))
    try:
        local_row_slice(mesh, 12)
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_local_row_slice_rejects_submesh(monkeypatch):
    """A mesh that does not span every process's devices cannot be
    row-partitioned (some hosts would own no mesh devices while still
    being assigned rows) — must raise, not return empty/garbage slices."""
    import jax

    from lecturemath_tpu.parallel.mesh import (MeshSpec, local_row_slice,
                                               make_mesh)

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(jax, "process_index", lambda: 0)
    for spec in (MeshSpec(data=1, model=1), MeshSpec(data=2, model=2)):
        mesh = make_mesh(spec)     # sub-mesh of the 8 virtual devices
        try:
            local_row_slice(mesh, 4)
            assert False, "expected ValueError for sub-mesh"
        except ValueError as e:
            assert "span all" in str(e)


def test_spatial_sharded_matches_plain():
    """shard_spatial: HEIGHT over the 'model' axis (GSPMD conv halo
    exchange) must be bit-identical to the batch-only sharding, including
    a height that does not divide across the shards (padded + cropped),
    and must reject combination with channel-sharded params."""
    model = FCNLectureNet(SHARDY, dtype=jnp.float32)
    variables = init_variables(model, jax.random.PRNGKey(1))

    mesh = make_mesh(MeshSpec(data=2, model=4))
    plain = ShardedBinarizer(model, variables, mesh)
    spatial = ShardedBinarizer(model, variables, mesh, shard_spatial=True)

    rng = np.random.default_rng(3)
    frames = rng.integers(0, 256, (4, 64, 48, 3), np.uint8)
    np.testing.assert_array_equal(spatial.binarize_frames(frames),
                                  plain.binarize_frames(frames))

    # height 40: not divisible by lcm(32, 4) -> edge-padded to 64 (the
    # same pad the plain path applies inside the jit), cropped back
    odd = rng.integers(0, 256, (4, 40, 48, 3), np.uint8)
    np.testing.assert_array_equal(spatial.binarize_frames(odd),
                                  plain.binarize_frames(odd))

    with pytest.raises(ValueError):
        ShardedBinarizer(model, variables, mesh,
                         shard_params_over_model=True, shard_spatial=True)
