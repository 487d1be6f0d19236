"""One host of a 2-process mesh invoking the REAL stage-01 CLI
(cli.binarize main with -mesh 4x2). Exercises the whole CLI multi-host
path end-to-end: the backend probe SKIP under LM_COORDINATOR (the probe
would otherwise break jax.distributed.initialize), the distributed join
inside resolve_mesh, warmup_collectives, per-host batching in the
Binarizer, the shared artifact write, and the shutdown barrier on the
way out (parallel/mesh.shutdown_distributed).

Launched as a subprocess — NOT a pytest module. Env contract:
LM_COORDINATOR, LM_NUM_PROCESSES, LM_PROCESS_ID, LM_CONF.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from lecturemath_tpu.cli.binarize import main  # noqa: E402

main(["binarize", os.environ["LM_CONF"], "-mesh", "4x2"])
assert not jax.distributed.is_initialized()    # CLI shut the mesh down
print("WORKER_DONE")
