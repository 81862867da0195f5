"""Narrow TPU bench: v5 vs v6 stencil kernels on the flagship box only.

Validates the v6 Mosaic lowering fix and gives a like-for-like v5/v6
pair in one process (bench.py methodology).  Run with the TPU otherwise
idle.  Appends a JSON line to V6_BENCH.jsonl.
"""

import json
import sys
import time


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    from bench import build_box, time_matvec, hbm_bw
    import jax
    import jax.numpy as jnp
    import numpy as np
    from krylovfspssa_tpu.ops.pallas_stencil import (
        make_pallas_stencil_matvec_v5,
        make_pallas_stencil_matvec_v6,
    )

    model, box = build_box()
    vol = box.volume
    nnz = vol * (model.n_reactions + 1)
    bw = hbm_bw(jax.devices()[0].platform)
    mask = jnp.ones(vol, dtype=bool)
    x = jnp.asarray(np.random.default_rng(0).random(vol), jnp.float32)
    csr_roof = (nnz * (4 + 4) + vol * 3 * 4) / bw
    mf_roof = vol * (2 * 4 + 1) / bw

    rec = {"vol": vol, "nnz": nnz}
    variants = [("v5", make_pallas_stencil_matvec_v5(model, box))]
    for br in (1024, 2048):
        mv = make_pallas_stencil_matvec_v6(model, box, block_rows=br)
        if mv is not None:
            variants.append((f"v6_B{mv._block_rows}", mv))
    for name, mv in variants:
        if mv is None:
            log(f"{name}: not applicable")
            continue
        try:
            per = time_matvec(mv, mask, x)
        except Exception as e:  # noqa: BLE001
            log(f"{name} FAILED: {type(e).__name__}: {str(e)[:300]}")
            rec[name] = {"error": str(e)[:300]}
            continue
        rec[name] = {
            "ms": round(per * 1e3, 4),
            "gnnz_s": round(nnz / per / 1e9, 1),
            "csr_roofline_pct": round(100 * csr_roof / per, 1),
            "mf_roofline_pct": round(100 * mf_roof / per, 1),
        }
        log(f"{name}: {per*1e3:.3f} ms  {rec[name]}")
    with open("V6_BENCH.jsonl", "a") as fh:
        fh.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
