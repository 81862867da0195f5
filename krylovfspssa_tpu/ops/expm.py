"""Dense matrix exponential of the small Krylov Hessenberg matrix.

Replicates EXPOKIT's ``DGPADM``/``DGPADMNORM``
(``/root/reference/src/expokit/dgpadm.f:2-339``): irreducible diagonal Padé
of degree ``ideg`` with scaling-and-squaring, plus the ``hnorm`` output
(= |t| * inf-norm of H, dgpadm.f:71-83) that feeds the reference's Krylov
cost model.

TPU-first twist: the reference computes on an ``mx x mx`` leading block with
``mx`` changing between steps.  Dynamic shapes would force recompilation, so
we always compute on the fixed (m_max+2)^2 matrix with rows/columns >= mx
masked to zero.  The Padé recurrences preserve the block-diagonal structure
[[H, 0], [0, 0]], whose exponential is [[exp(H), 0], [0, I]] — the leading
block is bit-for-bit the same computation as the reference's, and the
padding block stays harmless (it solves to the identity).

The linear solve runs in float64.  All matrices here are tiny
((m_max+2)^2 <= 102^2), so even with TPU float64 emulation this is a
negligible fraction of a solver step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def solve_plu(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Solve A X = B by Gaussian elimination with partial pivoting.

    TPU XLA implements LuDecomposition only for f32/c64, so
    ``jnp.linalg.solve`` cannot run in float64 on TPU; this is a
    backend-independent float64 LU (the DGESV of dgpadm.f:145) written as a
    shape-static ``fori_loop`` — fine for the tiny (m_max+2)^2 systems here.
    """
    n = A.shape[0]
    M = jnp.concatenate([A, B], axis=1)  # (n, 2n) augmented

    def elim(k, M):
        # partial pivot on column k
        col = jnp.abs(M[:, k])
        col = jnp.where(jnp.arange(n) >= k, col, -jnp.inf)
        piv = jnp.argmax(col)
        rk, rp = M[k], M[piv]
        M = M.at[k].set(rp).at[piv].set(rk)
        pivval = M[k, k]
        factors = jnp.where(
            jnp.arange(n) > k, M[:, k] / pivval, 0.0
        )
        return M - factors[:, None] * M[k][None, :]

    M = jax.lax.fori_loop(0, n, elim, M)

    # back substitution on the upper-triangular system
    U = M[:, :n]
    Y = M[:, n:]

    def backsub(i, X):
        k = n - 1 - i
        # rows > k of X are already solved; U[k, k]*X[k] term is zero
        acc = U[k] @ X
        xk = (Y[k] - acc) / U[k, k]
        return X.at[k].set(xk)

    X0 = jnp.zeros_like(Y)
    X = jax.lax.fori_loop(0, n, backsub, X0)
    return X


def _pade_coefficients(ideg: int) -> list[float]:
    """c_0..c_ideg of the (ideg,ideg) diagonal Padé (dgpadm.f:89-96)."""
    c = [1.0]
    i, j = ideg + 1, 2 * ideg + 1
    for k in range(1, ideg + 1):
        c.append(c[-1] * (i - k) / (k * (j - k)))
    return c


def expm_pade(H: jnp.ndarray, mx: jnp.ndarray, t: jnp.ndarray, ideg: int = 6):
    """exp(t * H[:mx,:mx]) embedded in the full matrix, plus hnorm and ns.

    Args:
      H: (MH, MH) float64 — full Hessenberg workspace (entries outside the
        leading mx block are ignored).
      mx: traced int — active block size.
      t: traced float — time scale (sign included).
      ideg: static Padé degree (reference default 6, KrylovSolver.f90:82).

    Returns:
      (E, hnorm, ns): E (MH, MH) with E[:mx,:mx] = exp(t H_mx) and
      E[i,i] = 1, E[i,j] = 0 elsewhere; hnorm = |t| * ||H_mx||_inf
      (the DGPADMNORM output); ns = number of squarings (for the NSCALE
      counter).
    """
    MH = H.shape[0]
    f = H.dtype
    idx = jnp.arange(MH)
    inblk = idx < mx
    mask2 = inblk[:, None] & inblk[None, :]
    A = jnp.where(mask2, H, 0).astype(f)
    eye = jnp.eye(MH, dtype=f)

    # ---- scaling (dgpadm.f:68-87): ns with ||t*H/2^ns|| < 1/2 ----------
    rowsum = jnp.sum(jnp.abs(A), axis=1)
    hnorm = jnp.abs(t) * jnp.max(rowsum)
    # Fortran: ns = MAX(0, INT(LOG(hnorm)/LOG(2)) + 2); INT truncates
    # toward zero.  Guard hnorm == 0 (the reference STOPs; we return exp(0)=I
    # gracefully — happens on instant happy breakdown at an absorbing state).
    safe_h = jnp.where(hnorm > 0, hnorm, 1.0)
    # clamp BEFORE the int cast: an inf/NaN hnorm (corrupted H) would
    # truncate to INT32_MAX and spin the squaring fori_loop for ~2^31
    # tiny matmuls — hours of device time, which a remote-worker
    # watchdog reports as "TPU worker crashed".  1100 > log2(f64 max),
    # so every FINITE hnorm keeps its exact Fortran squaring count; the
    # non-finite case produces NaN E and flows into the stepper's
    # bounded NaN handling (iflag=3) instead of hanging the device.
    ns_f = jnp.trunc(jnp.log(safe_h) / jnp.log(2.0)) + 2
    ns_f = jnp.where(jnp.isfinite(ns_f), ns_f, 1100.0)
    ns = jnp.clip(ns_f, 0.0, 1100.0).astype(jnp.int32)
    ns = jnp.where(hnorm > 0, ns, 0)
    scale = t / (2.0 ** ns).astype(f)

    coef = _pade_coefficients(ideg)
    A2 = (scale * scale) * (A @ A)

    # ---- Horner on even/odd parts (dgpadm.f:102-131), ideg static ------
    p = coef[ideg - 1] * eye
    q = coef[ideg] * eye
    iodd = 1
    for k in range(ideg - 1, 0, -1):
        if iodd == 1:
            q = q @ A2 + coef[k - 1] * eye
        else:
            p = p @ A2 + coef[k - 1] * eye
        iodd = 1 - iodd

    # ---- (+/-)(I + 2 (q - p)^{-1} p) (dgpadm.f:133-155) ----------------
    if iodd == 1:
        q = scale * (q @ A)
    else:
        p = scale * (p @ A)
    q = q - p
    X = solve_plu(q, p)
    E = 2.0 * X + eye
    if iodd == 1:
        # only reachable for odd Horner parity; with ideg=6 parity is even
        E = jnp.where(ns == 0, -E, E)

    # ---- squaring: E <- E^(2^ns) (dgpadm.f:157-166) --------------------
    E = jax.lax.fori_loop(0, ns, lambda _, M: M @ M, E)

    # restore exact identity in the padding block (it already solves to I,
    # but enforce it to keep padding bit-clean)
    E = jnp.where(mask2, E, jnp.where(idx[:, None] == idx[None, :], 1.0, 0.0))
    return E, hnorm, ns


# ------------------------------------------------------------------------
# Chebyshev alternative (DGCHBV parity, selected by ideg == 0)
# ------------------------------------------------------------------------

#: (14,14) uniform rational Chebyshev approximation of exp(x) on the
#: negative real axis: exp(z) ~ a0 + sum_i Re[alpha_i / (z - theta_i)].
#: Published coefficients (Carpenter/Ruttan/Varga tables, as used by
#: EXPOKIT's DGCHBV, /root/reference/src/expokit/dgchbv.f:55-70).
_CHEB_ALPHA0 = 0.183216998528140087e-11
_CHEB_ALPHA = (
    (+0.557503973136501826e02, -0.204295038779771857e03),
    (-0.938666838877006739e02, +0.912874896775456363e02),
    (+0.469965415550370835e02, -0.116167609985818103e02),
    (-0.961424200626061065e01, -0.264195613880262669e01),
    (+0.752722063978321642e00, +0.670367365566377770e00),
    (-0.188781253158648576e-01, -0.343696176445802414e-01),
    (+0.143086431411801849e-03, +0.287221133228814096e-03),
)
_CHEB_THETA = (
    (-0.562314417475317895e01, +0.119406921611247440e01),
    (-0.508934679728216110e01, +0.358882439228376881e01),
    (-0.399337136365302569e01, +0.600483209099604664e01),
    (-0.226978543095856346e01, +0.846173881758693369e01),
    (+0.208756929753827868e00, +0.109912615662209418e02),
    (+0.370327340957595652e01, +0.136563731924991884e02),
    (+0.889777151877331107e01, +0.166309842834712071e02),
)


def expm_chebyshev_col0(H: jnp.ndarray, mx: jnp.ndarray, t: jnp.ndarray):
    """First column of exp(t * H[:mx,:mx]) by Chebyshev partial fractions.

    The DGCHBV analog (dgchbv.f:2-94): y <- exp(tH) e1 via 7 complex-shifted
    linear solves.  The stepper only consumes column 0 of the exponential
    (the propagated Krylov coefficients and the two error components), so
    this returns an (MH, MH) matrix whose column 0 holds the result and
    whose remaining entries are the identity's.  TPU has no complex128, so
    each complex solve (tH - theta I) x = e1 runs as the equivalent real
    2MH x 2MH block system [[A, -B], [B, A]].

    Returns (E, hnorm, ns=0) matching the expm_pade interface.
    """
    MH = H.shape[0]
    f = H.dtype
    idx = jnp.arange(MH)
    inblk = idx < mx
    mask2 = inblk[:, None] & inblk[None, :]
    A = jnp.where(mask2, H, 0).astype(f) * t
    hnorm = jnp.abs(t) * jnp.max(jnp.sum(jnp.abs(jnp.where(mask2, H, 0)), axis=1))

    e1 = jnp.zeros((MH, 1), dtype=f).at[0, 0].set(1.0)
    # pad outside-block diagonal so the shifted systems stay nonsingular
    diag_pad = jnp.where(inblk, 0.0, 1.0)
    Apad = A + jnp.diag(diag_pad)

    # the tabulated (alpha, theta) approximate exp(-x) on [0, inf):
    #   exp(z) = alpha0 - sum_i Re[ alpha_i * (z + theta_i)^{-1} ]
    col = _CHEB_ALPHA0 * e1[:, 0]
    zeros = jnp.zeros((MH, 1), dtype=f)
    for (ar, ai), (tr, ti) in zip(_CHEB_ALPHA, _CHEB_THETA):
        # (Apad + (tr + i ti) I)(x + i y) = e1  ->  real block system
        Mr = Apad + tr * jnp.eye(MH, dtype=f)
        Mi = ti * jnp.eye(MH, dtype=f)
        M = jnp.block([[Mr, -Mi], [Mi, Mr]])
        rhs = jnp.concatenate([e1, zeros], axis=0)
        xy = solve_plu(M, rhs)
        x_re, x_im = xy[:MH, 0], xy[MH:, 0]
        # Re[alpha * (x + i y)] = ar*x - ai*y
        col = col - (ar * x_re - ai * x_im)

    col = jnp.where(inblk, col, 0.0)
    E = jnp.where(
        idx[:, None] == idx[None, :], 1.0, 0.0
    ).astype(f)
    E = E.at[:, 0].set(col)
    return E, hnorm, jnp.asarray(0, jnp.int32)
