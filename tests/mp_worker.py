"""Worker process for the real multi-process distributed test.

Launched by tests/test_multihost.py::test_two_process_training_matches_single
as `python tests/mp_worker.py DATA_DIR COORD NPROC PID STEPS GBS`.  Brings up
the JAX distributed runtime (the non-degenerate branch of
stabnet_tpu.parallel.multihost.initialize_distributed), feeds the
MultiHostPipeline, runs sharded train steps over the global mesh, and prints
one RESULT line with the per-step losses.

NOT a pytest module (no test_ prefix): pytest must not collect it.
"""

import json
import os
import sys

# Launched as `python tests/mp_worker.py ...`: sys.path[0] is tests/, so the
# repo root (where stabnet_tpu lives uninstalled) must be added explicitly.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    data_dir, coord, nproc, pid, steps, gbs = sys.argv[1:7]
    # Each process contributes its own virtual CPU devices to the GLOBAL
    # device list (devices_per_process * nproc devices overall).
    os.environ.setdefault("JAX_PLATFORMS", "cpu")

    import jax

    # This environment can carry a TPU PJRT plugin that force-installs
    # jax_platforms="axon,cpu"; pin cpu BEFORE any backend is created
    # (config.update does not initialize backends — see tests/conftest.py).
    jax.config.update("jax_platforms", "cpu")

    from stabnet_tpu.parallel.multihost import initialize_distributed

    # Must run before any backend-touching JAX call.
    initialize_distributed(coordinator_address=coord,
                           num_processes=int(nproc), process_id=int(pid))

    assert jax.process_count() == int(nproc), jax.process_count()

    from stabnet_tpu.config import get_config
    from stabnet_tpu.models import make_model
    from stabnet_tpu.parallel import MultiHostPipeline, data_mesh
    from stabnet_tpu.train.state import create_train_state
    from stabnet_tpu.train.train import make_train_step

    import time

    def note(msg):
        print(f"[mp_worker p{pid} t={time.time() - t0:.1f}s] {msg}",
              flush=True)

    t0 = time.time()
    cfg = get_config("tiny").replace(batch_size=int(gbs))
    mesh = data_mesh()
    pipe = MultiHostPipeline(data_dir, cfg, mesh, seed=0, shuffle=True)
    model = make_model(cfg)
    note("creating train state")
    state = create_train_state(model, cfg, jax.random.PRNGKey(0), mesh=mesh)
    step = make_train_step(model, cfg, mesh=mesh)

    losses = []
    for i in range(int(steps)):
        note(f"fetching batch {i}")
        batch = next(pipe)
        note(f"running step {i}")
        state, aux = step(state, batch)
        # aux comes out fully replicated; float() is legal cross-process.
        losses.append(float(aux["total"]))
        note(f"step {i} done: {losses[-1]}")

    if jax.process_index() == 0:
        print("RESULT " + json.dumps({"losses": losses}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
