"""Benchmark: CME SpMV throughput vs the stored-CSR HBM roofline.

Prints ONE JSON line:
  {"metric": "spmv_csr_roofline_pct", "value": <pct>, "unit": "%",
   "vs_baseline": <pct/70>}

The kernel measured is the solver's hottest op — the projected CME
generator matvec — in its TPU-native *matrix-free stencil* form (masked
power-of-two box, propensities recomputed from coordinates; see
krylovfspssa_tpu/ops/stencil.py) on a 4.2M-cell Goutsias box in the
solver's default float64.

Roofline accounting follows BASELINE.json ("CSR SpMV nnz/s (% roofline)"):
the HBM time a *perfect stored-CSR* SpMV would need for the same operator —
(4B column index + 8B value) per nnz plus the x/y vectors.  The matrix-free
stencil reads only x/y/mask, so 100% is not a ceiling for it; the
matrix-free roofline is reported on stderr.  BASELINE.md sets the round
target at >= 70%, so vs_baseline = pct / 70.

The reference Fortran publishes no numbers and cannot be compiled here
(no gfortran; BASELINE.md), so the roofline fraction — hardware-absolute —
is the headline.
"""

import json
import os
import sys
import time

import numpy as np

#: approximate HBM bandwidth per chip, by TPU generation.  Keyed by
#: substrings of jax.Device.device_kind; fall back to v5e if unknown.
HBM_BW_BY_KIND = {
    "v5 lite": 819e9,  # v5e
    "v5e": 819e9,
    "v5p": 2765e9,
    "v4": 1228e9,
    "v6": 1640e9,  # v6e (Trillium)
    "v3": 900e9,
}


def hbm_bw(backend: str) -> float:
    """Per-chip HBM bandwidth for the roofline; resolved from the actual
    device kind so the percentage does not silently mis-scale on non-v5e
    hardware (round-3 advisor note on the old 819 GB/s constant)."""
    if backend == "cpu":
        return 100e9
    import jax

    kind = jax.devices()[0].device_kind.lower()
    for k, bw in HBM_BW_BY_KIND.items():
        if k in kind:
            return bw
    log(f"unknown device kind {kind!r}; assuming v5e HBM bandwidth")
    return 819e9


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def build_box(target_m=64, target_d=64, target_rna=16):
    from krylovfspssa_tpu.boxspace.box import BoxSpace
    from krylovfspssa_tpu.models.library import goutsias_model

    model = goutsias_model()
    box = BoxSpace.for_model(model.stoichiometry, [[2, 6, 0, 2, 0, 0]])
    for s, tgt in enumerate([target_m, target_d, target_rna, 4, 4, 4]):
        while box.extents[s] < tgt:
            box = box.grow(s)
    return model, box


def time_matvec(matvec, mask, x, iters=400, repeats=2):
    """Per-matvec seconds from a chained device-side fori_loop.

    iters amortizes the per-dispatch latency (the axon tunnel adds ~27 ms
    per call, which at 50 iters would inflate every reading by ~0.5 ms).
    The inter-iteration normalization (needed so 400 chained matvecs
    neither overflow nor vanish) runs in the vector dtype: measured on
    v5e, an f64 normalization alone costs 0.14 ms at 4.2M cells (f64 is
    emulated) — more than the f32 kernel under test.
    """
    import jax
    import jax.numpy as jnp

    dtype = x.dtype

    @jax.jit
    def run(x):
        def body(i, x):
            y = matvec(mask, x)
            nrm = jnp.sqrt(jnp.sum(y * y) + jnp.asarray(1e-30, dtype))
            return y / nrm

        return jax.lax.fori_loop(0, iters, body, x)

    # distinct inputs per call: the axon remote relay caches identical
    # (executable, args) executions, which would fake near-zero timings
    rng = np.random.default_rng(123)
    xs = [
        x * jnp.asarray(1.0 + 1e-3 * rng.random(), dtype)
        for _ in range(repeats + 1)
    ]
    run(xs[0]).block_until_ready()
    best = np.inf
    for i in range(repeats):
        t0 = time.perf_counter()
        run(xs[i + 1]).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    return best / iters


def host_quiet_guard():
    """Refuse to bench under host CPU contention (round-4 lesson: a
    concurrent pytest run inflated v5 from 0.186 to 0.295 ms — the
    chained device loop still needs a responsive host for dispatch and
    timing).  Override with BENCH_IGNORE_LOAD=1."""
    if os.environ.get("BENCH_IGNORE_LOAD"):
        return
    try:
        load1 = os.getloadavg()[0]
        ncpu = os.cpu_count() or 1
    except OSError:
        return
    if load1 > 1.5 * ncpu:
        log(
            f"host busy (load {load1:.1f} on {ncpu} CPUs) — readings "
            "would be contention-inflated; waiting up to 10 min for "
            "quiet (set BENCH_IGNORE_LOAD=1 to measure anyway)"
        )
        deadline = time.time() + 600
        while time.time() < deadline:
            time.sleep(20)
            load1 = os.getloadavg()[0]
            if load1 <= 1.0 * ncpu:
                log(f"host quiet (load {load1:.1f}); proceeding")
                return
        log(
            f"host still busy (load {load1:.1f}) after 10 min — "
            "proceeding, but treat readings as contention-flagged"
        )


def main():
    t_start = time.time()
    host_quiet_guard()
    try:
        import jax
        import jax.numpy as jnp

        from krylovfspssa_tpu.ops.stencil import make_stencil_matvec

        platform = jax.devices()[0].platform
        bw = hbm_bw("cpu" if platform == "cpu" else "tpu")
        log(f"devices: {jax.devices()} (first-op init can take minutes on axon)")

        scale = int(os.environ.get("BENCH_SCALE", 64))
        model, box = build_box(target_m=scale, target_d=scale)
        vol, R = box.volume, model.n_reactions
        nnz = vol * (R + 1)
        log(f"box {box.shape} vol={vol} nnz={nnz} maxoff={np.abs(box.offsets).max()}")

        variants = [
            ("xla-f64", jnp.float64, make_stencil_matvec(model, box, jnp.float64)),
            ("xla-f32", jnp.float32, make_stencil_matvec(model, box, jnp.float32)),
        ]
        try:
            from krylovfspssa_tpu.ops.pallas_stencil import (
                make_pallas_stencil_matvec_v2,
                make_pallas_stencil_matvec_v3,
                make_pallas_stencil_matvec_v4,
                make_pallas_stencil_matvec_v5,
                make_pallas_stencil_matvec_v6,
                pallas_applicable,
            )

            if platform not in ("cpu", "gpu") and pallas_applicable(box):
                variants.append(
                    (
                        "pallas-v2-f32",
                        jnp.float32,
                        make_pallas_stencil_matvec_v2(model, box),
                    )
                )
                mv3 = make_pallas_stencil_matvec_v3(model, box)
                if mv3 is not None:
                    variants.append(("pallas-v3-f32", jnp.float32, mv3))
                mv4 = make_pallas_stencil_matvec_v4(model, box)
                if mv4 is not None:
                    variants.append(("pallas-v4-f32", jnp.float32, mv4))
                mv5 = make_pallas_stencil_matvec_v5(model, box)
                if mv5 is not None:
                    variants.append(("pallas-v5-f32", jnp.float32, mv5))
                mv6 = make_pallas_stencil_matvec_v6(model, box)
                if mv6 is not None:
                    variants.append(("pallas-v6-f32", jnp.float32, mv6))
        except Exception as e:  # noqa: BLE001
            log(f"pallas variant unavailable: {e}")

        results = {}
        for name, dtype, matvec in variants:
            vb = np.dtype(dtype).itemsize
            mask = jnp.ones(vol, dtype=bool)
            x = jnp.asarray(np.random.default_rng(0).random(vol), dtype=dtype)
            try:
                per = time_matvec(matvec, mask, x)
            except Exception as e:  # noqa: BLE001
                log(f"{name} failed: {e}")
                continue
            csr_roof = (nnz * (4 + vb) + vol * 3 * vb) / bw
            mf_roof = vol * (2 * vb + 1) / bw
            pct = 100.0 * csr_roof / per
            results[name] = pct
            log(
                f"{name}: {per*1e3:.3f} ms/matvec, "
                f"{nnz/per/1e9:.2f} Gnnz/s, CSR-roofline {csr_roof*1e3:.3f} ms "
                f"-> {pct:.1f}% (matrix-free roofline {mf_roof*1e3:.3f} ms "
                f"-> {100.0*mf_roof/per:.1f}%)"
            )

        log(f"total bench wall: {time.time()-t_start:.1f}s")
        # headline: the fastest production kernel relative to its own
        # dtype's stored-CSR roofline (the solver's Krylov path runs this
        # kernel; f32 values + f64 reductions keep the FSP criterion exact)
        pct = max(results.values())
        print(
            json.dumps(
                {
                    "metric": "spmv_csr_roofline_pct",
                    "value": round(pct, 2),
                    "unit": "%",
                    "vs_baseline": round(pct / 70.0, 4),
                }
            )
        )
    except Exception as e:  # noqa: BLE001
        log(f"bench failed: {type(e).__name__}: {e}")
        print(
            json.dumps(
                {
                    "metric": "spmv_csr_roofline_pct",
                    "value": 0.0,
                    "unit": "%",
                    "vs_baseline": 0.0,
                }
            )
        )
        raise


if __name__ == "__main__":
    main()
