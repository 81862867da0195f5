"""Adaptive Krylov time step — the core of DGEXPV_FSP, jit-compiled.

One call to the function built by :func:`make_step_fn` performs exactly one
*attempted* time step of the reference algorithm
(``/root/reference/src/fsp/KrylovSolver.f90:206-550``), entirely on device:

  * IOP Arnoldi factorization (resumable on Krylov-dimension growth),
  * Padé exponential of the augmented Hessenberg,
  * the Sidje local error estimate with NaN step-shrink retry
    (KrylovSolver.f90:289-310),
  * Niesen–Wright step-size/dimension adaptivity with the flop-cost model
    (KrylovSolver.f90:313-373,618-639),
  * the rejection loop (shrink tau, or grow m and resume Arnoldi;
    KrylovSolver.f90:375-434),
  * the FSP probability-mass criterion loop with its own step shrinking and
    the 5-rejection SSA bailout (KrylovSolver.f90:442-495).

All loops are ``lax.while_loop``s over fixed-shape carries; the Krylov
dimension m, the resume column, and the active block size are traced
scalars, so a single compiled executable serves every step.  The host only
sees the step *outcome* (advance, expand, drop sizes) and mutates the state
set between calls.
"""

from __future__ import annotations

import math
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..config import SolverConfig
from ..ops.expm import expm_chebyshev_col0, expm_pade
from .arnoldi import arnoldi_extend

_SQR1 = math.sqrt(0.1)
EPS = float(jnp.finfo(jnp.float64).eps)


def _nint(x):
    """Fortran NINT for the positive arguments used here."""
    return jnp.floor(x + 0.5)


def round_2sig(t, add: float):
    """Reference step rounding to ~2 significant digits
    (KrylovSolver.f90:186-187 et al.): p1 = 10**(NINT(log10 t - sqrt(.1))-1);
    t = AINT(t/p1 + add) * p1 with add in {0.55, 0.0}."""
    p1 = 10.0 ** (_nint(jnp.log10(t) - _SQR1) - 1.0)
    return jnp.trunc(t / p1 + add) * p1


def first_stepsize(m, beta, krytol, anorm, t_out):
    """Very first step size (KrylovSolver.f90:182-187)."""
    xm = 1.0 / m
    p1 = krytol * (((m + 1) / 2.72) ** (m + 1)) * jnp.sqrt(2.0 * 3.14 * (m + 1))
    t_new = (1.0 / anorm) * (p1 / (4.0 * beta * anorm)) ** xm
    return round_2sig(t_new, 0.55)


class StepCarry(NamedTuple):
    """Scalar state carried between accepted steps (the reference's locals
    that survive the GOTO-100 loop)."""

    t_now: jnp.ndarray
    t_new: jnp.ndarray
    beta: jnp.ndarray
    wsum_old: jnp.ndarray
    m_new: jnp.ndarray  # int32
    # --- adaptivity history (persist across steps in the reference) ---
    omega: jnp.ndarray
    t_old: jnp.ndarray
    m_old: jnp.ndarray  # int32
    order: jnp.ndarray
    kfactor: jnp.ndarray
    orderold: jnp.ndarray  # bool
    kestold: jnp.ndarray  # bool
    # --- statistics (IWSP/WSP, KrylovSolver.f90:554-573) ---
    nstep: jnp.ndarray
    nmult: jnp.ndarray
    nexph: jnp.ndarray
    nscale: jnp.ndarray
    nreject: jnp.ndarray
    ibrkflag: jnp.ndarray
    mbrkdwn: jnp.ndarray
    tbrkdwn: jnp.ndarray
    step_min: jnp.ndarray
    step_max: jnp.ndarray
    s_error: jnp.ndarray
    x_error: jnp.ndarray
    hump: jnp.ndarray
    vnorm: jnp.ndarray
    #: failure code: 0 ok, 2 = too many step rejections when
    #: config.mxreject > 0 (KrylovSolver.f90:392-397)
    iflag: jnp.ndarray
    #: cumulative measured probability-mass loss (step truncation + drops),
    #: float64.  In float32 mode the FSP criterion and the drop budget run
    #: on this scalar instead of the absolute ``wsum`` (whose f32
    #: representation noise random-walks ~1 ULP per step, which an
    #: absolute comparison cannot distinguish from truncation loss).
    spent: jnp.ndarray


class StepResult(NamedTuple):
    w: jnp.ndarray
    carry: StepCarry
    #: True if t_now advanced (False only on the FSP-abandon path)
    advanced: jnp.ndarray
    #: expansion requested (FSP criterion failed at least once this step)
    iexpand: jnp.ndarray
    #: SSA time horizon to use if expanding (already min'd with remaining
    #: time, KrylovSolver.f90:520-521)
    t_ssa: jnp.ndarray
    #: droppable surplus mass; host should drop states if > 0 and this was
    #: a non-expansion step after the first (KrylovSolver.f90:509-511)
    dsum: jnp.ndarray
    wsum: jnp.ndarray
    t_step: jnp.ndarray
    m_used: jnp.ndarray
    err_loc: jnp.ndarray


def initial_carry(beta, t_out, krytol, anorm, m0: int) -> StepCarry:
    f64 = jnp.float64
    t_new = first_stepsize(
        jnp.asarray(float(m0), f64),
        jnp.asarray(beta, f64),
        jnp.asarray(krytol, f64),
        jnp.asarray(anorm, f64),
        jnp.asarray(t_out, f64),
    )
    z = jnp.asarray(0.0, f64)
    return StepCarry(
        t_now=z,
        t_new=t_new,
        beta=jnp.asarray(beta, f64),
        wsum_old=jnp.asarray(1.0, f64),
        m_new=jnp.asarray(m0, jnp.int32),
        omega=z,
        t_old=z,
        m_old=jnp.asarray(m0, jnp.int32),
        order=jnp.asarray(float(m0) / 4.0, f64),
        kfactor=jnp.asarray(2.0, f64),
        orderold=jnp.asarray(True),
        kestold=jnp.asarray(True),
        nstep=jnp.asarray(0, jnp.int32),
        nmult=jnp.asarray(0, jnp.int32),
        nexph=jnp.asarray(0, jnp.int32),
        nscale=jnp.asarray(0, jnp.int32),
        nreject=jnp.asarray(0, jnp.int32),
        ibrkflag=jnp.asarray(0, jnp.int32),
        mbrkdwn=jnp.asarray(m0, jnp.int32),
        tbrkdwn=z,
        step_min=jnp.asarray(t_out, f64),
        step_max=z,
        s_error=z,
        x_error=z,
        hump=jnp.asarray(beta, f64),
        vnorm=jnp.asarray(beta, f64),
        iflag=jnp.asarray(0, jnp.int32),
        spent=z,
    )


def make_step_fn(
    matvec_builder: Callable,
    config: SolverConfig,
    op_info: Callable | None = None,
):
    """Build the jittable single-attempted-step function.

    Args:
      matvec_builder: op -> (x -> A@x) closure factory; ``op`` is an opaque
        pytree (the gather-ELL CmeOperator, or the box backend's mask).
      config: solver constants (static).
      op_info: op -> (n_active, n_reactions) for the cost model and Krylov
        dimension bound; defaults to the CmeOperator layout.

    Returns:
      step(op, w, carry, t_out, fsptol, krytol) -> StepResult, safe to wrap
      in jax.jit with ``op``/``w`` as device arrays.
    """
    m_min = config.m_min
    m_max = config.m_max
    qiop = config.qiop
    delta = config.delta
    gamma = config.gamma
    ideg = config.ideg
    break_tol = config.break_tol
    anorm = config.anorm
    max_fsp_rejects = config.max_fsp_rejects
    mxreject = config.mxreject
    MH = m_max + 2

    # ideg == 0 selects the Chebyshev partial-fraction expv instead of Padé
    # (KrylovSolver.f90:278-287; dead code at the reference default ideg=6)
    if ideg == 0:
        def expm_fn(Hb, mxv, ts, _ideg):
            return expm_chebyshev_col0(Hb, mxv, ts)
    else:
        expm_fn = expm_pade

    if op_info is None:
        op_info = lambda op: (  # noqa: E731
            op.n, op.props.shape[1], 2.0 * jnp.max(op.diag)
        )

    def step(op, w, sc: StepCarry, t_out, fsptol, krytol) -> StepResult:
        matvec = matvec_builder(op)
        f = w.dtype
        cap = w.shape[0]
        info = op_info(op)
        if len(info) == 3:
            n, n_reactions, anorm_est = info
        else:
            n, n_reactions = info
            anorm_est = 1.0
        # happy-breakdown threshold scaled to the OPERATOR norm.  The
        # reference's absolute BREAK_TOL=1e-7 (KrylovSolver.f90:173,249)
        # assumes ||A|| ~ O(1); CME generators have ||A|| ~ 1e2-1e5, so
        # the near-breakdown Arnoldi residual — numerical dust amplified
        # by ||A|| — can sit just ABOVE an absolute 1e-7 forever.
        # Measured on TPU (toggle, quasi-stationary): h_{2,1} = 1.5e-7
        # vs CPU ~1e-8 for the same math; with IOP q=2 the post-near-
        # breakdown columns then explode to O(||A||) garbage, every
        # larger-tau attempt reads a huge error, and the controller
        # throttles at ~3x the step count (413 vs 134 on toggle t=200).
        # Scale factor 0.1 * anorm_est (anorm_est ~ 2*max diag): wide
        # margin over the measured platform dust (~5e-10 * ||A||) while
        # staying far below real slow-mode amplitudes — a 2*max_diag
        # scale proved TOO loose (declared "breakdown" on 3e-5-level
        # real dynamics and took a tau=143 jump with a 3.6e-4 mass
        # overshoot).  The two-sided FSP criterion below is the
        # backstop for any remaining over-eager breakdown.
        break_eff = break_tol * jnp.maximum(
            1.0, 0.1 * jnp.asarray(anorm_est, jnp.float64)
        )
        n = jnp.asarray(n, jnp.int32)
        nnz = (n_reactions + 1) * n  # KrylovSolver.f90:196,537
        nf = n.astype(f)
        sgn = jnp.sign(t_out)
        t_out_abs = jnp.abs(t_out)
        rndoff = EPS * anorm
        # float32 vectors carry O(ULP) noise in their total mass, which
        # random-walks across steps; the absolute reference criterion
        # ``wsum >= 1 - bound`` cannot tell that drift from truncation loss
        # and rejects forever once it exceeds the bound.  In f32 mode the
        # criterion is therefore *incremental*: each step's measured loss
        # (start mass - end mass, both f64 sums of the f32 vector, so the
        # drift largely cancels) is charged against its pro-rata allowance
        # plus a small per-step noise floor, and the cumulative charge
        # (carry.spent) drives the drop budget.  The floor is RESERVED out
        # of the budget (bound below runs on fsp_tol - floor), so the final
        # certified loss is bound(t_out) + floor = fsp_tol exactly — the
        # reference's absolute guarantee (KrylovSolver.f90:442-458) holds
        # in both dtypes.  Callers enforce fsp_tol >= mult*floor before
        # choosing float32 (config.resolve_solve_dtype).
        if f == jnp.float32:
            crit_floor = config.f32_criterion_floor()
        else:
            crit_floor = 0.0

        def bound(tx):
            # FERRORBOUND (KrylovSolver.f90:609-616); f32 reserves the
            # noise floor out of the budget (see above)
            if crit_floor:
                return tx * jnp.maximum(fsptol - crit_floor, 0.0) / t_out_abs
            return tx * fsptol / t_out_abs

        def krylov_cost(tau, m, hnorm):
            # KrylovSolver.f90:618-639
            mf = m.astype(f) if hasattr(m, "astype") else jnp.asarray(m, f)
            lg = jnp.log(jnp.maximum(tau * hnorm, 1e-300)) / jnp.log(2.0)
            nom = 25.0 / 3.0 + jnp.maximum(0.0, 2.0 + jnp.trunc(lg))
            nom = jnp.where(tau * hnorm > 0, nom, 25.0 / 3.0)
            steps = _nint((t_out_abs - sc.t_now) / tau)
            q = float(qiop)
            return steps * (
                2.0 * (mf + 1.0) * nnz.astype(f)
                + (5.0 * mf + 4.0 * q * mf + 2.0 * q - 2.0 * q * q + 7.0) * nf
                + 2.0 * nom * (mf + 2.0) ** 3
            )

        # ------------------------------------------------ step set-up ----
        # mass at the start of this step (after any drop), for the f32
        # incremental criterion
        wsum_start = jnp.sum(w.astype(jnp.float64)) if crit_floor else None

        t_step0 = jnp.minimum(t_out_abs - sc.t_now, sc.t_new)
        m0 = jnp.minimum(n.astype(jnp.int32) - 1, sc.m_new)
        # m_new can carry a larger value across geometries whose memory
        # clamp (config.max_basis_bytes) lowered this step's m_max
        m0 = jnp.minimum(m0, m_max)
        m0 = jnp.maximum(m0, 1)
        beta = sc.beta

        V0 = jnp.zeros((MH, cap), dtype=f).at[0].set((w / beta).astype(f))
        # the Hessenberg is tiny and always float64: f32 coefficients would
        # floor at vector-noise scale and stall the dimension adaptivity
        H0 = jnp.zeros((MH, MH), dtype=jnp.float64)

        # ---------------------------------------------- attempt loop -----
        # phases: arnoldi (conditional) -> expm+error -> adapt -> decide
        class A(NamedTuple):
            V: jnp.ndarray
            H: jnp.ndarray
            m: jnp.ndarray
            jold: jnp.ndarray
            needs_arnoldi: jnp.ndarray
            t_step: jnp.ndarray
            t_new: jnp.ndarray
            m_new: jnp.ndarray
            k1: jnp.ndarray
            mbrk: jnp.ndarray
            avnorm: jnp.ndarray
            hnorm: jnp.ndarray
            E: jnp.ndarray
            err_loc: jnp.ndarray
            ireject: jnp.ndarray
            imreject: jnp.ndarray
            omega: jnp.ndarray
            omega_old: jnp.ndarray
            t_old: jnp.ndarray
            m_old: jnp.ndarray
            order: jnp.ndarray
            kfactor: jnp.ndarray
            orderold: jnp.ndarray
            kestold: jnp.ndarray
            accept: jnp.ndarray
            brk: jnp.ndarray
            nmult: jnp.ndarray
            nexph: jnp.ndarray
            nscale: jnp.ndarray
            nreject: jnp.ndarray
            #: local error stayed NaN through the bounded tau/5 retry —
            #: structural numeric corruption; exits the step with iflag=3
            nanfail: jnp.ndarray

        def attempt_body(a: A) -> A:
            # ---- Arnoldi phase (labels 101-300) -------------------------
            def run_arnoldi(a: A) -> A:
                st = arnoldi_extend(
                    matvec, a.V, a.H, a.jold, a.m, qiop, break_eff
                )
                k1 = jnp.where(st.breakdown, 0, 2).astype(jnp.int32)
                t_step = jnp.where(
                    st.breakdown, t_out_abs - sc.t_now, a.t_step
                )
                return a._replace(
                    V=st.V,
                    H=st.H,
                    k1=k1,
                    mbrk=jnp.where(st.breakdown, st.mbrkdwn, a.m),
                    avnorm=st.avnorm,
                    t_step=t_step,
                    brk=st.breakdown,
                    needs_arnoldi=jnp.asarray(False),
                    nmult=a.nmult + st.nmult,
                )

            a = jax.lax.cond(a.needs_arnoldi, run_arnoldi, lambda x: x, a)

            # ---- expm + local error, with NaN tau/5 retry (401-310) -----
            mx = a.mbrk + a.k1
            m_f = a.m.astype(f)
            # the (m+2)^2 Hessenberg exponential always runs in float64
            # (reference parity; the matrix is tiny so cost is negligible)
            Hbar = a.H.astype(jnp.float64).at[a.m + 1, a.m].set(1.0)

            def expm_err(carry):
                t_step, _, _, _, nexph, nscale, tries = carry
                E, hnorm, ns = expm_fn(Hbar, mx, sgn * t_step, ideg)
                p1 = jnp.abs(E[a.m, 0]) * beta
                p2 = jnp.abs(E[a.m + 1, 0]) * beta * a.avnorm
                err_k1 = jnp.where(
                    p1 > 10.0 * p2,
                    p2,
                    jnp.where(p1 > p2, (p1 * p2) / (p1 - p2), p1),
                )
                err = jnp.where(a.k1 == 0, krytol, err_k1)
                return (t_step, E, hnorm, err, nexph + 1, nscale + ns, tries)

            # bounded tau/5 retry (KrylovSolver.f90:307-310 is an
            # unbounded GOTO; unbounded on DEVICE means a persistent NaN
            # — corrupted basis/H — spins the while_loop until a remote
            # watchdog kills the worker).  40 retries shrink tau by
            # 5^40 ~ 1e28; a NaN that survives that is structural, so
            # exit with nanfail -> iflag=3 instead of hanging.
            def nan_cond(carry):
                return jnp.isnan(carry[3]) & (carry[6] < 40)

            def nan_body(carry):
                t_step = carry[0] / 5.0
                return expm_err(
                    (t_step, carry[1], carry[2], carry[3], carry[4],
                     carry[5], carry[6] + 1)
                )

            first = expm_err(
                (a.t_step, a.E, a.hnorm, a.err_loc, a.nexph, a.nscale,
                 jnp.asarray(0, jnp.int32))
            )
            (t_step, E, hnorm, err_loc, nexph, nscale, _tries) = (
                jax.lax.while_loop(nan_cond, nan_body, first)
            )
            nanfail = jnp.isnan(err_loc)

            # ---- omega + order/kappa estimation (312-337) ---------------
            omega_old = a.omega
            # floor: err_loc can underflow to EXACTLY 0 (observed on TPU
            # — E[m,0] of a superlinearly-converged step), and the
            # order estimator's log(omega/omega_old) would then be
            # log(0/0) = NaN after a rejection, poisoning t_new and the
            # whole subsequent step (intermittent iflag=3 failures)
            omega = jnp.maximum(err_loc, 1e-300) / (krytol * t_step)

            use_order_est = (
                (a.m == a.m_old) & (t_step != a.t_old) & (a.ireject >= 1)
            )
            order_est = jnp.maximum(
                1.0,
                jnp.log(omega / omega_old) / jnp.log(t_step / a.t_old),
            )
            use_default_order = a.orderold | (a.ireject == 0)
            order = jnp.where(
                use_order_est,
                order_est,
                jnp.where(use_default_order, m_f / 4.0, a.order),
            )
            orderold = ~use_order_est

            use_k_est = (
                (a.m != a.m_old) & (t_step == a.t_old) & (a.ireject >= 1)
            )
            k_est = jnp.maximum(
                1.1,
                (omega / omega_old)
                ** (1.0 / (a.m_old - a.m).astype(f)),
            )
            use_default_k = a.kestold | (a.ireject == 0)
            kfactor = jnp.where(
                use_k_est, k_est, jnp.where(use_default_k, 2.0, a.kfactor)
            )
            kestold = ~use_k_est

            t_old = t_step
            m_old = a.m

            # ---- new step/dimension suggestion (339-373) ----------------
            t_shrunk = jnp.minimum(
                t_out_abs - sc.t_now,
                jnp.maximum(
                    t_step / 5.0,
                    jnp.minimum(
                        5.0 * t_step,
                        gamma * t_step * omega ** (-1.0 / order),
                    ),
                ),
            )
            force_tau = ((a.m == m_max) & (omega > delta)) | (a.imreject > 4)

            m_opt = jnp.minimum(
                jnp.minimum(
                    jnp.maximum(
                        jnp.maximum(m_min, 3 * a.m // 4),
                        a.m
                        + jnp.ceil(
                            jnp.log(omega) / jnp.log(kfactor)
                        ).astype(jnp.int32),
                    ),
                    m_max,
                ),
                (jnp.ceil(4.0 * m_f / 3.0) + 1).astype(jnp.int32),
            )
            cost1 = krylov_cost(t_shrunk, a.m, hnorm)
            cost2 = krylov_cost(t_step, m_opt, hnorm)
            prefer_tau = cost1 <= cost2

            t_new = jnp.where(
                force_tau | prefer_tau, round_2sig(t_shrunk, 0.0), t_step
            )
            m_new = jnp.where(
                force_tau | prefer_tau, a.m, m_opt
            ).astype(jnp.int32)
            m_changed = ~(force_tau | prefer_tau)

            # ---- rejection decision (375-434) ---------------------------
            rejected = (a.k1 != 0) & (omega > delta)

            def reject_tau(a: A) -> A:
                ts = jnp.minimum(
                    t_out_abs - sc.t_now,
                    jnp.maximum(
                        t_step / 5.0, jnp.minimum(5.0 * t_step, t_new)
                    ),
                )
                ts = round_2sig(ts, 0.55)
                return a._replace(
                    t_step=ts,
                    ireject=a.ireject + 1,
                    nreject=a.nreject + 1,
                    needs_arnoldi=jnp.asarray(False),
                )

            def reject_m(a: A) -> A:
                return a._replace(
                    m=m_new,
                    jold=m_old,
                    mbrk=m_new,
                    k1=jnp.asarray(2, jnp.int32),
                    t_step=jnp.minimum(t_out_abs - sc.t_now, t_new),
                    needs_arnoldi=jnp.asarray(True),
                    nreject=a.nreject + 1,
                    imreject=a.imreject + 1,
                )

            def accept_fn(a: A) -> A:
                return a._replace(accept=jnp.asarray(True))

            a = a._replace(
                E=E,
                hnorm=hnorm,
                err_loc=err_loc,
                omega=omega,
                omega_old=omega_old,
                t_old=t_old,
                m_old=m_old,
                order=order,
                kfactor=kfactor,
                orderold=orderold,
                kestold=kestold,
                t_new=t_new,
                m_new=m_new,
                t_step=t_step,
                nexph=nexph,
                nscale=nscale,
                nanfail=nanfail,
            )
            a = jax.lax.cond(
                rejected,
                lambda a: jax.lax.cond(m_changed, reject_m, reject_tau, a),
                accept_fn,
                a,
            )
            return a

        a0 = A(
            V=V0,
            H=H0,
            m=m0,
            jold=jnp.asarray(1, jnp.int32),
            needs_arnoldi=jnp.asarray(True),
            t_step=t_step0,
            t_new=sc.t_new,
            m_new=sc.m_new,
            k1=jnp.asarray(2, jnp.int32),
            mbrk=m0,
            avnorm=jnp.asarray(0.0, jnp.float64),
            hnorm=jnp.asarray(0.0, jnp.float64),
            E=jnp.zeros((MH, MH), dtype=jnp.float64),
            err_loc=jnp.asarray(0.0, jnp.float64),
            ireject=jnp.asarray(0, jnp.int32),
            imreject=jnp.asarray(0, jnp.int32),
            omega=sc.omega,
            omega_old=sc.omega,
            t_old=sc.t_old,
            m_old=sc.m_old,
            order=sc.order,
            kfactor=sc.kfactor,
            orderold=sc.orderold,
            kestold=sc.kestold,
            accept=jnp.asarray(False),
            brk=jnp.asarray(False),
            nmult=jnp.asarray(0, jnp.int32),
            nexph=jnp.asarray(0, jnp.int32),
            nscale=jnp.asarray(0, jnp.int32),
            nreject=jnp.asarray(0, jnp.int32),
            nanfail=jnp.asarray(False),
        )
        # The reference's rejection loop is an unbounded GOTO
        # (MXREJECT=0 default, KrylovSolver.f90:392-397) — acceptable on
        # a debuggable host, but an unbounded DEVICE loop turns any
        # knife-edge controller cycle into a remote-watchdog worker
        # kill.  Cap attempts at max(mxreject, 512): 512 rejections mean
        # tau has shrunk by >= 5^many with the error still not meeting
        # the tolerance — genuinely stuck, surfaced as IFLAG=2.
        hard_attempts = mxreject if mxreject > 0 else 512
        attempt_cond = lambda a: (  # noqa: E731
            (~a.accept)
            & (~a.nanfail)
            & (a.ireject + a.imreject <= hard_attempts)
        )
        a = jax.lax.while_loop(attempt_cond, attempt_body, a0)
        #: rejection-budget exhaustion (mxreject > 0) or persistent NaN
        fail = (~a.accept) | a.nanfail

        # grow next step aggressively on tiny error (KrylovSolver.f90:437)
        t_new_acc = jnp.where(
            a.err_loc < 1.0e-16,
            jnp.maximum(a.t_new, 2.0 * a.t_step),
            a.t_new,
        )
        mx = a.mbrk + jnp.maximum(0, a.k1 - 1)

        # ------------------------------- FSP criterion loop (442-495) ----
        row_in = jnp.arange(MH) < mx
        Hbar = a.H.astype(jnp.float64).at[a.m + 1, a.m].set(1.0)

        if crit_floor:
            # float64 column sums of the basis: the criterion mass
            # beta * (colsum . E[:,0]) is then measured entirely in f64,
            # so the FSP budget never sees the f32 w-assembly rounding
            # noise.  (Previously that noise entered `spent` directly;
            # being ~1e-7/step against a per-step budget increment of
            # ~fsp_tol*tau/t_out it could random-walk spent into the
            # ceiling, where the abandon->expand loop deadlocks — SSA
            # expansion cannot refund noise — and the box grows without
            # bound.  Observed on TPU: toggle t=1000 fsp_tol 2e-5 grew a
            # 190-state problem past max_box_volume.)
            def _csum(j, cs):
                return cs.at[j].set(jnp.sum(a.V[j], dtype=jnp.float64))

            colsum = jax.lax.fori_loop(
                0, mx, _csum, jnp.zeros((MH,), jnp.float64)
            )

        def assemble_w(E):
            # w = beta * V @ E[:,0] (KrylovSolver.f90:444) as a bounded AXPY
            # loop: a dot_general here materializes an (emulation x MH x n)
            # HLO temp — 13 GB at n=4.2M in float64 on TPU — while the loop
            # peaks at O(n).
            coeff = (jnp.where(row_in, E[:, 0], 0.0) * beta).astype(f)

            def axpy(j, acc):
                return acc + coeff[j] * a.V[j]

            wc = jax.lax.fori_loop(0, mx, axpy, jnp.zeros(cap, dtype=f))
            if crit_floor:
                # f32: keep the signed vector.  Clipping every step turns
                # zero-mean rounding noise into a systematic positive mass
                # drift (~1e-7 per step, percent-level over long solves);
                # results are clipped once at reporting instead.
                return wc
            return jnp.maximum(wc, 0.0)

        class FC(NamedTuple):
            E: jnp.ndarray
            t_step: jnp.ndarray
            w: jnp.ndarray
            wsum: jnp.ndarray
            irejectfsp: jnp.ndarray
            error_old: jnp.ndarray
            tau_old: jnp.ndarray
            ok: jnp.ndarray
            abandon: jnp.ndarray
            nexph: jnp.ndarray
            nscale: jnp.ndarray

        def fsp_check(fc: FC) -> FC:
            if crit_floor:
                # f32: mass from the f64 basis column sums (no assembly,
                # no assembly noise); cumulative measured loss vs the
                # reference bound — identical to the absolute criterion
                # in exact arithmetic (spent + loss = 1 - wsum), but
                # drift-free.  w is assembled once after the loop.
                wsum = beta * jnp.sum(
                    jnp.where(row_in, fc.E[:, 0], 0.0) * colsum
                )
                ok = (sc.spent + (wsum_start - wsum)) <= (
                    bound(sc.t_now + fc.t_step) + crit_floor
                )
                return fc._replace(wsum=wsum, ok=ok)
            w_c = assemble_w(fc.E)
            # mass criterion always accumulates in float64.  TWO-SIDED:
            # the reference checks only wsum >= 1 - bound
            # (KrylovSolver.f90:458) because in exact arithmetic CME mass
            # can only LEAK; a numerically garbage step (e.g. an
            # over-eager breakdown jump) can OVERSHOOT 1, which the
            # one-sided check would happily accept.  True mass never
            # exceeds 1, so an overshoot beyond the same budget is
            # equally disqualifying and triggers the same tau shrink.
            wsum = jnp.sum(w_c.astype(jnp.float64))
            b = bound(sc.t_now + fc.t_step)
            ok = (wsum >= 1.0 - b) & (wsum <= 1.0 + b)
            return fc._replace(w=w_c, wsum=wsum, ok=ok)

        def fsp_body(fc: FC) -> FC:
            # criterion failed: shrink the step via the FSP order model
            irejectfsp = fc.irejectfsp + 1
            # magnitude of the mass defect drives the shrink-order model
            # (an overshoot rejection has negative raw loss)
            error = jnp.abs(
                (wsum_start - fc.wsum) if crit_floor
                else sc.wsum_old - fc.wsum
            )
            abandon = irejectfsp >= max_fsp_rejects

            err_safe = jnp.maximum(error, 1e-300)
            fsporder = jnp.where(
                irejectfsp == 1,
                2.0,
                jnp.log(err_safe / jnp.maximum(fc.error_old, 1e-300))
                / jnp.log(fc.t_step / fc.tau_old)
                - 1.0,
            )
            tfsp = (
                gamma
                * fc.t_step
                * (fsptol * fc.t_step / (err_safe * t_out_abs))
                ** (1.0 / fsporder)
            )
            ts = jnp.minimum(
                t_out_abs - sc.t_now,
                jnp.maximum(
                    fc.t_step / 5.0, jnp.minimum(0.9 * fc.t_step, tfsp)
                ),
            )
            ts = round_2sig(ts, 0.55)

            E, _, ns = expm_fn(Hbar, mx, sgn * ts, ideg)
            fc = fc._replace(
                E=E,
                t_step=ts,
                irejectfsp=irejectfsp,
                error_old=error,
                tau_old=fc.t_step,
                abandon=abandon,
                nexph=fc.nexph + 1,
                nscale=fc.nscale + ns,
            )
            return fsp_check(fc)

        fc0 = fsp_check(
            FC(
                E=a.E,
                t_step=a.t_step,
                w=w,
                wsum=jnp.asarray(0.0, jnp.float64),
                irejectfsp=jnp.asarray(0, jnp.int32),
                error_old=jnp.asarray(1.0, jnp.float64),
                tau_old=a.t_step,
                ok=jnp.asarray(False),
                abandon=jnp.asarray(False),
                nexph=a.nexph,
                nscale=a.nscale,
            )
        )
        fc = jax.lax.while_loop(
            lambda fc: (~fc.ok) & (~fc.abandon) & (~fail), fsp_body, fc0
        )
        # a final shrink that satisfies the criterion is an accepted step
        # even though it also hit the rejection cap (the reference would
        # accept that same tau on the post-expansion retry anyway)
        fc = fc._replace(abandon=fc.abandon & ~fc.ok)
        if crit_floor:
            # assemble the accepted vector once; skip the O(m*n) AXPY loop
            # on abandon/fail paths whose assembled result the post-step
            # bookkeeping discards anyway (advisor round-3 finding)
            fc = jax.lax.cond(
                fc.abandon | fail,
                lambda fc: fc,
                lambda fc: fc._replace(w=assemble_w(fc.E)),
                fc,
            )

        iexpand = ((fc.irejectfsp > 0) | fc.abandon) & (~fail)

        # --------------------------- post-step bookkeeping (497-550) -----
        # abandon path (466-470): revert w, do not advance time; the
        # IFLAG=2 failure path likewise returns the step's starting vector
        w_final = jnp.where(fc.abandon | fail, beta.astype(f) * a.V[0], fc.w)
        advanced = (~fc.abandon) & (~fail)
        t_now_new = jnp.where(advanced, sc.t_now + fc.t_step, sc.t_now)
        wsum_new = jnp.where(advanced, fc.wsum, sc.wsum_old)
        nstep_new = sc.nstep + jnp.where(advanced, 1, 0)

        done = t_now_new >= t_out_abs

        # cumulative measured loss (zero-mean noise cancels in the sum;
        # clamp at 0 so upward drift cannot bank negative budget)
        if crit_floor:
            loss_step = wsum_start - fc.wsum
        else:
            loss_step = sc.wsum_old - fc.wsum
        spent_new = jnp.maximum(
            sc.spent + jnp.where(advanced, loss_step, 0.0), 0.0
        )

        if crit_floor:
            # f32: pin the stored mass to the f64 bookkeeping.  The
            # one-sided criterion preferentially accepts upward-noise
            # steps (lossy attempts get rejected), so the raw f32 mass
            # drifts up ~3e-7/step; rescaling each accepted vector to
            # 1 - spent keeps the reference semantic (mass = 1 minus
            # cumulative certified loss) without the drift.
            target = 1.0 - spent_new
            # pin against the ACTUAL assembled mass (fc.wsum is the f64
            # colsum estimate, which excludes assembly rounding)
            actual = jnp.sum(w_final, dtype=jnp.float64)
            scale = jnp.where(
                advanced & (actual > 0.0), target / actual, 1.0
            )
            w_final = w_final * scale.astype(f)
            wsum_new = jnp.where(advanced, target, sc.wsum_old)

        # drop surplus (509-511); host acts when dsum > 0
        if crit_floor:
            # f32: remaining cumulative allowance, immune to wsum drift
            dsum_raw = jnp.maximum(bound(t_now_new) - spent_new, 0.0)
        else:
            dsum_raw = fc.wsum - (1.0 - bound(t_now_new))
        can_drop = advanced & (~done) & (nstep_new > 1) & (~iexpand)
        dsum = jnp.where(can_drop, dsum_raw, 0.0)

        # SSA horizon (518-521): when expanding on the first step,
        # t_new := t_step
        t_new_eff = jnp.where(
            iexpand & (nstep_new == 1), fc.t_step, t_new_acc
        )
        t_ssa = jnp.minimum(t_new_eff, t_out_abs - t_now_new)

        beta_new = jnp.sqrt(jnp.sum((w_final * w_final).astype(jnp.float64)))
        err_final = jnp.maximum(a.err_loc, rndoff)
        carry = StepCarry(
            t_now=t_now_new,
            t_new=round_2sig(t_new_eff, 0.55),
            beta=beta_new,
            wsum_old=wsum_new,
            m_new=a.m_new,
            omega=a.omega,
            t_old=a.t_old,
            m_old=a.m_old,
            order=a.order,
            kfactor=a.kfactor,
            orderold=a.orderold,
            kestold=a.kestold,
            nstep=nstep_new,
            nmult=sc.nmult + a.nmult,
            nexph=sc.nexph + fc.nexph,
            nscale=sc.nscale + fc.nscale,
            nreject=sc.nreject + a.nreject,
            ibrkflag=jnp.where(a.brk, 1, sc.ibrkflag).astype(jnp.int32),
            mbrkdwn=jnp.where(a.brk, a.mbrk, sc.mbrkdwn).astype(jnp.int32),
            tbrkdwn=jnp.where(a.brk, sc.t_now, sc.tbrkdwn),
            step_min=jnp.where(
                advanced, jnp.minimum(sc.step_min, fc.t_step), sc.step_min
            ),
            step_max=jnp.where(
                advanced, jnp.maximum(sc.step_max, fc.t_step), sc.step_max
            ),
            s_error=sc.s_error + jnp.where(advanced, err_final, 0.0),
            x_error=jnp.maximum(sc.x_error, err_final),
            hump=jnp.maximum(sc.hump, beta_new),
            vnorm=sc.vnorm,
            iflag=jnp.where(
                fail, jnp.where(a.nanfail, 3, 2), sc.iflag
            ).astype(jnp.int32),
            spent=spent_new,
        )
        return StepResult(
            w=w_final,
            carry=carry,
            advanced=advanced,
            iexpand=iexpand & (t_now_new < t_out_abs),
            t_ssa=t_ssa,
            dsum=dsum,
            wsum=fc.wsum,
            t_step=fc.t_step,
            m_used=a.m,
            err_loc=a.err_loc,
        )

    return step
