"""Weak-scaling harness: row-partitioned stencil SpMV over a device mesh.

Measures the sharded box-backend matvec at every device count 1..N on the
available mesh, holding the per-device cell count fixed (weak scaling), and
reports parallel efficiency.  The measured kernel is the PRODUCTION sharded
path: the explicit ppermute halo-exchange matvec (ops/halo.py) when the
geometry qualifies, the GSPMD-partitioned XLA stencil otherwise (the path
used is recorded per row).

On a real pod slice this is the BASELINE.md ">= 80% weak-scaling at
N >= 2" run; on a single chip or the virtual 8-device CPU mesh it
degenerates to a FUNCTIONAL check of the sharded path — the CPU "devices"
share one socket's memory bandwidth, so efficiency numbers from a CPU mesh
measure contention, not ICI scaling, and are recorded as functional-only.

Usage:  python bench_scaling.py [--cells-per-device 524288] [--iters 50]
                                [--out SCALING.json] [--dtype float64]
Prints one JSON line; --out also writes the full per-device table.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cells-per-device", type=int, default=1 << 19)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--out", help="write the full per-device JSON table")
    ap.add_argument("--dtype", default="float64",
                    choices=("float64", "float32"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from krylovfspssa_tpu.boxspace.box import BoxSpace
    from krylovfspssa_tpu.models.library import goutsias_model
    from krylovfspssa_tpu.ops.halo import make_halo_stencil_matvec
    from krylovfspssa_tpu.ops.stencil import make_stencil_matvec
    from krylovfspssa_tpu.parallel.sharded import STATE_AXIS, make_mesh

    dtype = jnp.float64 if args.dtype == "float64" else jnp.float32
    devices = jax.devices()
    platform = devices[0].platform
    model = goutsias_model()
    R = model.n_reactions
    results = []

    counts = [n for n in (1, 2, 4, 8, 16, 32) if n <= len(devices)]
    for n_dev in counts:
        target = args.cells_per_device * n_dev
        box = BoxSpace.for_model(model.stoichiometry, [[2, 6, 0, 2, 0, 0]])
        s = 0
        while box.volume < target:
            box = box.grow(s % model.n_species)
            s += 1
        mesh = make_mesh(n_dev)
        row = NamedSharding(mesh, P(STATE_AXIS))
        matvec = make_halo_stencil_matvec(model, box, mesh, dtype)
        path = "halo"
        if matvec is None:
            matvec = make_stencil_matvec(model, box, dtype)
            path = "gspmd"

        iters = args.iters

        @jax.jit
        def run(mask, x):
            def body(i, x):
                y = matvec(mask, x)
                nrm = jnp.sqrt(jnp.sum(y * y) + 1e-300).astype(x.dtype)
                return y / nrm

            return jax.lax.fori_loop(0, iters, body, x)

        rng = np.random.default_rng(0)
        mask = jax.device_put(
            jnp.asarray(rng.random(box.volume) < 0.5), row
        )
        xs = [
            jax.device_put(jnp.asarray(rng.random(box.volume), dtype), row)
            for _ in range(2)
        ]
        jax.block_until_ready(run(mask, xs[0]))
        t0 = time.perf_counter()
        jax.block_until_ready(run(mask, xs[1]))
        per = (time.perf_counter() - t0) / args.iters
        nnz = box.volume * (R + 1)
        gnnzs = nnz / per / 1e9
        results.append(
            {
                "devices": n_dev,
                "volume": box.volume,
                "ms_per_matvec": round(per * 1e3, 3),
                "gnnz_per_s": round(gnnzs, 2),
                "path": path,
            }
        )
        print(
            f"{n_dev} device(s) [{path}]: vol={box.volume} "
            f"{per*1e3:.3f} ms/matvec {gnnzs:.2f} Gnnz/s",
            file=sys.stderr,
            flush=True,
        )

    if len(results) > 1:
        base = results[0]["gnnz_per_s"]
        eff = results[-1]["gnnz_per_s"] / (results[-1]["devices"] * base) * 100.0
    else:
        eff = 100.0
    summary = {
        "metric": "spmv_weak_scaling_efficiency",
        "value": round(eff, 2),
        "unit": "%",
        "devices": results[-1]["devices"],
        "platform": platform,
        "functional_only": platform == "cpu",
        "vs_baseline": round(eff / 80.0, 4),
    }
    if args.out:
        with open(args.out, "w") as fh:
            json.dump({"summary": summary, "rows": results}, fh, indent=1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
