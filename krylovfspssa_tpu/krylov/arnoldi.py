"""Incomplete-orthogonalization (IOP) Arnoldi process.

Replicates the reference's IOP loop
(``/root/reference/src/fsp/KrylovSolver.f90:236-263``): at step j the new
Krylov vector A v_j is orthogonalized only against the last ``qiop`` basis
vectors (window 2 by default), with happy-breakdown detection at
``||v|| <= break_tol`` (KrylovSolver.f90:249-256).

TPU-first design: the basis V is a fixed (m_max+2, cap) row-major array and
H a fixed (m_max+2)^2 array so the loop is shape-static; the Krylov
dimension m and the resume column jold are *traced* scalars driving a
``lax.while_loop`` — growing m (the reference's dimension-adaptive
rejection, KrylovSolver.f90:400-432) resumes the factorization from column
m_old with no recompilation and no H copy (the augmented corrected-scheme
entry H[m+1,m]=1 is never stored; it is applied when calling expm).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


def dot64(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """<a, b> with float64 accumulation, at ~float32 cost.

    A plain f32 tree-dot over n elements carries absolute error
    ~log2(n) * eps32 * sum|a_i b_i| — for near-orthogonal Arnoldi vectors
    that noise (~1e-6) dwarfs the true coefficient, floors the Hessenberg
    entries, and blocks Krylov-dimension growth (the controller stalls at
    m~15 with tiny steps).  Blocked accumulation bounds the f32 rounding
    to one 128-wide lane sum (~7 roundings) and finishes the cross-block
    reduction in f64, restoring f64-grade coefficients for f32 vectors.
    """
    if a.dtype == jnp.float64:
        return jnp.dot(a, b)
    p = a * b
    n = p.shape[0]
    if n % 128:
        return jnp.sum(p.astype(jnp.float64))
    return jnp.sum(jnp.sum(p.reshape(-1, 128), axis=1).astype(jnp.float64))


class ArnoldiState(NamedTuple):
    V: jnp.ndarray  #: (m_max+2, cap) basis rows; V[j] = v_{j+1} (0-based)
    H: jnp.ndarray  #: (m_max+2, m_max+2) float64 Hessenberg (no augmented entry)
    breakdown: jnp.ndarray  #: bool — happy breakdown occurred
    mbrkdwn: jnp.ndarray  #: int32 — 1-based column where it occurred (== m if none)
    avnorm: jnp.ndarray  #: float64 — ||A v_{m+1}|| (valid when no breakdown)
    nmult: jnp.ndarray  #: int32 — matvec counter increment


def arnoldi_extend(
    matvec: Callable[[jnp.ndarray], jnp.ndarray],
    V: jnp.ndarray,
    H: jnp.ndarray,
    jold: jnp.ndarray,
    m: jnp.ndarray,
    qiop: int,
    break_tol: float,
) -> ArnoldiState:
    """Extend the Arnoldi factorization from column ``jold`` to ``m``.

    Args:
      matvec: y = A @ x on padded vectors.
      V: basis with rows 0..jold-1 valid (v_1..v_jold); row jold-1 is the
        current last basis vector.
      H: Hessenberg data for the first jold-1 columns.
      jold, m: 1-based resume/target columns (traced), jold <= m.
      qiop: static orthogonalization window (reference QIOP=2).
      break_tol: happy-breakdown tolerance.
    """
    f = V.dtype

    def body(carry):
        V, H, j, brk, mb, nmult = carry
        # w = A v_j  (V row j-1)
        w = matvec(V[j - 1])
        nmult = nmult + 1
        istart = jnp.maximum(1, j - qiop + 1) if qiop > 0 else 1

        def ortho(i, c):
            w, H = c
            vi = V[i - 1]
            # f64-accumulated coefficient (H is float64); the AXPY stays
            # in the basis dtype
            hij = dot64(vi, w)
            w = w - hij.astype(f) * vi
            H = H.at[i - 1, j - 1].set(hij)
            return (w, H)

        w, H = jax.lax.fori_loop(istart, j + 1, ortho, (w, H))
        hj1j = jnp.sqrt(dot64(w, w))

        def on_breakdown(args):
            V, H, w, hj1j = args
            return V, H, jnp.bool_(True), j

        def on_continue(args):
            V, H, w, hj1j = args
            H2 = H.at[j, j - 1].set(hj1j)
            V2 = V.at[j].set(w * (1.0 / hj1j).astype(f))
            return V2, H2, jnp.bool_(False), m.astype(jnp.int32)

        V, H, brk, mb = jax.lax.cond(
            hj1j <= break_tol, on_breakdown, on_continue, (V, H, w, hj1j)
        )
        return (V, H, j + 1, brk, mb, nmult)

    def cond(carry):
        _, _, j, brk, _, _ = carry
        return (j <= m) & (~brk)

    init = (
        V,
        H,
        jold.astype(jnp.int32),
        jnp.bool_(False),
        m.astype(jnp.int32),
        jnp.int32(0),
    )
    V, H, j, brk, mb, nmult = jax.lax.while_loop(cond, body, init)

    # extra matvec for the 2-corrected error estimate
    # (KrylovSolver.f90:261-263); only meaningful without breakdown
    def extra(args):
        V, nmult = args
        w = matvec(V[m])  # A v_{m+1}
        return jnp.sqrt(dot64(w, w)), nmult + 1

    def no_extra(args):
        V, nmult = args
        return jnp.asarray(0.0, dtype=jnp.float64), nmult

    avnorm, nmult = jax.lax.cond(~brk, extra, no_extra, (V, nmult))

    return ArnoldiState(
        V=V, H=H, breakdown=brk, mbrkdwn=mb, avnorm=avnorm, nmult=nmult
    )
