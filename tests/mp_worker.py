"""Worker process for tests/test_multiprocess_mesh.py: one host of an
N-process x M-virtual-CPU-device global 8-device mesh (2x4 and 4x2
configurations). Runs the dp x tp train step and frame-sharded
binarization across the process boundary and writes its results (losses +
local binary rows) to LM_OUT_PATH.

Launched as a subprocess — NOT a pytest module. Env contract:
LM_COORDINATOR, LM_NUM_PROCESSES, LM_PROCESS_ID, LM_OUT_PATH,
LM_LOCAL_DEVICES (virtual devices per process, default 4).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOCAL_DEVICES = int(os.environ.get("LM_LOCAL_DEVICES", "4"))
os.environ["XLA_FLAGS"] = (
    "--xla_force_host_platform_device_count=%d" % LOCAL_DEVICES)
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from lecturemath_tpu.parallel.mesh import (MeshSpec,  # noqa: E402
                                           initialize_distributed_from_env,
                                           make_mesh, warmup_collectives)

assert initialize_distributed_from_env()
PROC_ID = int(os.environ["LM_PROCESS_ID"])

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from mp_workload import (NET_CONFIG, make_train_batch,  # noqa: E402
                         make_frames, run_training, run_inference)


def main():
    assert jax.process_count() == int(os.environ["LM_NUM_PROCESSES"])
    assert len(jax.devices()) == 8
    assert len(jax.local_devices()) == LOCAL_DEVICES
    mesh = make_mesh(MeshSpec(data=4, model=2))
    # establish all cross-process Gloo contexts while host skew is small:
    # the communicator rendezvous has a ~30 s deadline, far shorter than
    # the big train-step compile that follows on this 1-core VM
    warmup_collectives(mesh)

    # dp x tp training: every host passes the SAME global batch of 8; the
    # Trainer slices this host's 4 rows internally (host-local batching)
    batch = make_train_batch()
    losses = run_training(mesh, batch)

    # frame-sharded inference: global batch of 8 frames in, FULL binary
    # output back on every host (all-gathered packed result)
    frames = make_frames()
    binary = run_inference(mesh, frames)

    np.save(os.environ["LM_OUT_PATH"] + ".npy", binary)
    with open(os.environ["LM_OUT_PATH"], "w") as f:
        json.dump({"process_id": PROC_ID, "losses": losses,
                   "n_devices": len(jax.devices()),
                   "n_local": len(jax.local_devices())}, f)
    print(f"[proc {PROC_ID}] done: losses={losses}", flush=True)

    # reach the coordination-service shutdown barrier TOGETHER: on this
    # 1-core VM compile skew between the hosts can exceed the 30 s shutdown
    # barrier window if each process exits (atexit shutdown) on its own
    # schedule — a cross-process sync right before an explicit shutdown
    # bounds the skew to milliseconds
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("lm_mp_worker_done")
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
