"""Child process for the multi-host smoke test (test_multihost.py).

Runs as one of two `jax.distributed` CPU processes: initializes the
multi-controller runtime, builds the global mesh over all processes'
devices, solves bursting-gene on the box backend, and prints the result
as one JSON line for the parent to compare across processes.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


def main():
    coordinator = sys.argv[1]
    process_id = int(sys.argv[2])

    from krylovfspssa_tpu.parallel import multihost

    ok = multihost.initialize(
        coordinator_address=coordinator, num_processes=2,
        process_id=process_id,
    )
    assert ok, "expected a 2-process runtime"
    assert jax.process_count() == 2
    mesh = multihost.global_mesh()
    assert mesh.devices.size == 8  # 4 local CPU devices x 2 processes

    from krylovfspssa_tpu.boxsolver import solve_cme_box
    from krylovfspssa_tpu.models.library import bursting_gene_model

    r = solve_cme_box(
        bursting_gene_model(), 5.0, [[0, 0]], fsp_tol=1e-4, krylov_tol=1e-8,
        mesh=mesh,
    )
    print(
        "RESULT "
        + json.dumps(
            {
                "pid": process_id,
                "wsum": r.wsum,
                "nstep": r.stats.nstep,
                "fsp": r.stats.final_fsp_size,
                "psum": float(r.probabilities[:16].sum()),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
