"""Worker process for tests/test_multiprocess_mesh.py: one host of a
2-process x 4-virtual-CPU-device global mesh. Runs the dp x tp train step
and frame-sharded binarization across the process boundary and writes its
results (losses + local binary rows) to LM_OUT_PATH.

Launched as a subprocess — NOT a pytest module. Env contract:
LM_COORDINATOR, LM_NUM_PROCESSES, LM_PROCESS_ID, LM_OUT_PATH.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from lecturemath_tpu.parallel.mesh import (MeshSpec,  # noqa: E402
                                           initialize_distributed_from_env,
                                           make_mesh)

assert initialize_distributed_from_env()
PROC_ID = int(os.environ["LM_PROCESS_ID"])

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from mp_workload import (NET_CONFIG, make_train_batch,  # noqa: E402
                         make_frames, run_training, run_inference)


def main():
    assert jax.process_count() == 2
    assert len(jax.devices()) == 8 and len(jax.local_devices()) == 4
    mesh = make_mesh(MeshSpec(data=4, model=2))

    # dp x tp training: global batch 8, this host feeds ITS 4 rows
    batch = make_train_batch()
    local_batch = {k: v[PROC_ID * 4:(PROC_ID + 1) * 4]
                   for k, v in batch.items()}
    losses = run_training(mesh, local_batch)

    # frame-sharded inference: global batch of 8 frames, 4 per host
    frames = make_frames()
    local_binary = run_inference(mesh, frames[PROC_ID * 4:(PROC_ID + 1) * 4])

    np.save(os.environ["LM_OUT_PATH"] + ".npy", local_binary)
    with open(os.environ["LM_OUT_PATH"], "w") as f:
        json.dump({"process_id": PROC_ID, "losses": losses,
                   "n_devices": len(jax.devices()),
                   "n_local": len(jax.local_devices())}, f)
    print(f"[proc {PROC_ID}] done: losses={losses}", flush=True)


if __name__ == "__main__":
    main()
