"""Ablation harness for the v5 Pallas stencil kernel (TPU only).

Times v5 variants with pieces knocked out to locate the bottleneck:
full, no_shift (unshifted window reads), no_pattern (skip the pattern
multiply), no_rowfac, no_mask, one_term (single reaction), and block-size
sweeps.  Methodology identical to bench.py's time_matvec.

Not part of the recorded BENCH metric — a diagnostic tool.
"""

import sys
import time

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax.numpy as jnp

    from bench import build_box, time_matvec
    from krylovfspssa_tpu.ops.pallas_stencil import (
        make_pallas_stencil_matvec_v5,
    )

    model, box = build_box()
    vol = box.volume
    log(f"box {box.shape} vol={vol}")
    mask = jnp.ones(vol, dtype=bool)
    x = jnp.asarray(np.random.default_rng(0).random(vol), jnp.float32)

    cases = [
        ("full", frozenset(), 1024),
        ("no_shift", frozenset({"no_shift"}), 1024),
        ("no_pattern", frozenset({"no_pattern"}), 1024),
        ("no_rowfac", frozenset({"no_rowfac"}), 1024),
        ("no_mask", frozenset({"no_mask"}), 1024),
        ("one_term", frozenset({"one_term"}), 1024),
        ("bare", frozenset({"one_term", "no_shift", "no_pattern",
                            "no_rowfac", "no_mask"}), 1024),
        ("full_B512", frozenset(), 512),
        ("full_B2048", frozenset(), 2048),
        ("full_B4096", frozenset(), 4096),
    ]
    v6_cases = [
        ("v6_full", frozenset(), 2048),
        ("v6_no_shift", frozenset({"no_shift"}), 2048),
        ("v6_no_pattern", frozenset({"no_pattern"}), 2048),
        ("v6_no_scal", frozenset({"no_scal"}), 2048),
        ("v6_no_mask", frozenset({"no_mask"}), 2048),
        ("v6_one_term", frozenset({"one_term"}), 2048),
        ("v6_bare", frozenset({"one_term", "no_shift", "no_pattern",
                               "no_scal", "no_mask"}), 2048),
        ("v6_B512", frozenset(), 512),
        ("v6_B1024", frozenset(), 1024),
        ("v6_B4096", frozenset(), 4096),
    ]

    from krylovfspssa_tpu.ops.pallas_stencil import (
        make_pallas_stencil_matvec_v6,
    )

    only = sys.argv[1] if len(sys.argv) > 1 else None
    for factory, cs in ((make_pallas_stencil_matvec_v5, cases),
                        (make_pallas_stencil_matvec_v6, v6_cases)):
        for name, abl, br in cs:
            if only and only not in name:
                continue
            try:
                mv = factory(model, box, block_rows=br, _ablate=abl)
                if mv is None:
                    log(f"{name}: not applicable")
                    continue
                t0 = time.time()
                per = time_matvec(mv, mask, x)
                log(f"{name:14s}: {per*1e3:.3f} ms/matvec  "
                    f"(wall {time.time()-t0:.0f}s)")
            except Exception as e:  # noqa: BLE001 — e.g. VMEM OOM at big B
                log(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
