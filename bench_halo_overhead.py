"""Halo-path overhead decomposition (VERDICT r3 item 6).

Round-3 left two open questions about the sharded SpMV:

  * SCALING_r03.json showed 0.855 -> 2.33 ms/matvec going 1 -> 2 devices
    at constant per-device volume on the CPU mesh — a 2.7x jump from one
    boundary exchange that deserved a diagnosis;
  * no measurement isolated pure sharding overhead from communication.

This harness separates the terms.  On ANY backend it measures, at the
same volume V:

  A. unsharded stencil matvec                      (baseline compute)
  B. halo path over a 1-device mesh                (B-A = shard_map +
     dispatch overhead; the exchange degenerates to a self-permute)
  C. halo path over a 2-device mesh, volume 2V     (weak step: adds one
     real boundary exchange + splits compute over 2 devices)
  D. unsharded matvec at volume 2V                 (serial 2V baseline;
     on a parallel machine C should approach D/2 + exchange)
  P. pure ppermute of the halo buffers, 2 devices  (isolated comm cost)

On the 2-core CPU host the 8 "devices" of the test mesh share two
physical cores, so absolute efficiencies are meaningless — the point of
the CPU run is the OVERHEAD STRUCTURE (B-A, P).  The ICI projection for
real multi-chip hardware is computed analytically below from the
measured single-chip kernel time and the comm-volume model, and recorded
in SCALING_r04.json.

Usage: python bench_halo_overhead.py [--volume 131072] [--iters 50]
       [--dtype float64] [--out HALO_OVERHEAD.json]
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _time(fn, *args, iters=1):
    import jax

    jax.block_until_ready(fn(*args))  # compile + warm
    t0 = time.perf_counter()
    jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--volume", type=int, default=1 << 17)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--dtype", default="float64",
                    choices=("float64", "float32"))
    ap.add_argument("--out", default="HALO_OVERHEAD.json")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (set XLA_FLAGS="
                    "--xla_force_host_platform_device_count=N for a mesh)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
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
    rng = np.random.default_rng(0)
    iters = args.iters
    out = {"platform": platform, "dtype": args.dtype, "iters": iters}

    def grow_to(target):
        box = BoxSpace.for_model(model.stoichiometry, [[2, 6, 0, 2, 0, 0]])
        s = 0
        while box.volume < target:
            box = box.grow(s % model.n_species)
            s += 1
        return box

    def bench_matvec(matvec, box, sharding=None):
        @jax.jit
        def run(mask, x):
            def body(i, x):
                y = matvec(mask, x)
                nrm = jnp.sqrt(jnp.sum(y * y) + 1e-300).astype(x.dtype)
                return y / nrm

            return jax.lax.fori_loop(0, iters, body, x)

        mask = jnp.asarray(rng.random(box.volume) < 0.5)
        x = jnp.asarray(rng.random(box.volume), dtype)
        if sharding is not None:
            mask = jax.device_put(mask, sharding)
            x = jax.device_put(x, sharding)
        return _time(run, mask, x, iters=iters)

    box1 = grow_to(args.volume)
    box2 = grow_to(2 * args.volume)

    # A: unsharded at V
    tA = bench_matvec(make_stencil_matvec(model, box1, dtype), box1)
    out["A_unsharded_V_ms"] = round(tA * 1e3, 4)

    # build the 1-device halo path FIRST so A' (the like-for-like
    # unsharded baseline) can use the SAME local kernel generation the
    # halo path actually selected (ops/halo.py records it on the matvec;
    # previously A' could bench v6 while the halo path ran v5-local,
    # contaminating shard_overhead_1dev_ms)
    mesh1 = make_mesh(1)
    row1 = NamedSharding(mesh1, P(STATE_AXIS))
    mv1 = make_halo_stencil_matvec(model, box1, mesh1, dtype)

    # A': unsharded PALLAS kernel at V (f32 TPU), generation-matched;
    # B - A' isolates pure shard_map/exchange overhead
    tA_pl = None
    if (dtype == jnp.float32 and platform not in ("cpu", "gpu")
            and mv1 is not None and getattr(mv1, "_pallas_local", False)):
        from krylovfspssa_tpu.ops.pallas_stencil import (
            make_pallas_stencil_matvec_v5,
            make_pallas_stencil_matvec_v6,
        )

        gen = getattr(mv1, "_local_kernel", None) or "v5"
        mk = (make_pallas_stencil_matvec_v6 if gen == "v6"
              else make_pallas_stencil_matvec_v5)
        mv_pl = mk(model, box1)
        if mv_pl is not None:
            try:
                tA_pl = bench_matvec(mv_pl, box1)
                out["A_pallas_V_ms"] = round(tA_pl * 1e3, 4)
                out["A_pallas_kernel"] = gen
            except Exception as e:  # noqa: BLE001
                print(f"{mk.__name__} failed: {str(e)[:160]}",
                      file=sys.stderr, flush=True)
                tA_pl = None

    # B: halo over 1-device mesh at V
    if mv1 is not None:
        out["halo_local_kernel"] = getattr(mv1, "_local_kernel", None)
        tB = bench_matvec(mv1, box1, row1)
        out["B_halo_1dev_V_ms"] = round(tB * 1e3, 4)
        base = tA_pl if (
            tA_pl is not None and getattr(mv1, "_pallas_local", False)
        ) else tA
        out["shard_overhead_1dev_ms"] = round((tB - base) * 1e3, 4)

    # D: unsharded at 2V
    tD = bench_matvec(make_stencil_matvec(model, box2, dtype), box2)
    out["D_unsharded_2V_ms"] = round(tD * 1e3, 4)

    if len(devices) >= 2:
        mesh2 = make_mesh(2)
        row2 = NamedSharding(mesh2, P(STATE_AXIS))
        # C: halo over 2 devices at 2V
        mv2 = make_halo_stencil_matvec(model, box2, mesh2, dtype)
        if mv2 is not None:
            tC = bench_matvec(mv2, box2, row2)
            out["C_halo_2dev_2V_ms"] = round(tC * 1e3, 4)

        # P: isolated ppermute of the halo-sized boundary buffers
        from jax.experimental.shard_map import shard_map

        halo_cells = int(np.abs(np.asarray(box2.offsets)).max())
        rows_l = box2.volume // 2

        def exchange(x):
            def inner(xl):
                left = jax.lax.ppermute(
                    xl[:halo_cells], STATE_AXIS, [(0, 1), (1, 0)]
                )
                right = jax.lax.ppermute(
                    xl[-halo_cells:], STATE_AXIS, [(1, 0), (0, 1)]
                )
                return xl + 0 * (left.sum() + right.sum())

            return shard_map(
                inner, mesh=mesh2, in_specs=P(STATE_AXIS),
                out_specs=P(STATE_AXIS),
            )(x)

        @jax.jit
        def runP(x):
            return jax.lax.fori_loop(
                0, iters, lambda i, x: exchange(x), x
            )

        xP = jax.device_put(
            jnp.asarray(rng.random(box2.volume), dtype), row2
        )
        tP = _time(runP, xP, iters=iters)
        out["P_ppermute_pair_ms"] = round(tP * 1e3, 4)
        out["halo_cells"] = halo_cells

    # ---- analytic ICI projection (v5e constants) -------------------------
    # one-way ICI bandwidth per link ~45 GB/s (public scaling-book figure
    # for v5e); halo = maxoff cells each direction, f32.
    halo_cells = int(np.abs(np.asarray(box2.offsets)).max())
    halo_bytes = halo_cells * (4 if args.dtype == "float32" else 8)
    t_comm_us = halo_bytes / 45e9 * 1e6
    out["ici_projection"] = {
        "assumed_oneway_link_GBps": 45,
        "halo_bytes_per_direction": halo_bytes,
        "t_comm_us_per_exchange": round(t_comm_us, 2),
        "note": (
            "per-device matvec time shrinks ~1/n_dev (weak scaling holds "
            "per-device volume, so it stays ~the single-chip time); the "
            "exchange overlaps with interior compute (ops/halo.py "
            "interior-first), so predicted ICI efficiency = "
            "t_comp / max(t_comp, t_comm) with t_comp the per-device "
            "kernel time"
        ),
    }

    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
