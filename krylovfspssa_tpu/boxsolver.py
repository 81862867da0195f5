"""Krylov-FSP-SSA solver on the masked-box backend — the flagship TPU path.

Same adaptive algorithm as solver.py (the jitted stepper is shared), but the
FSP lives in a masked power-of-two box (boxspace/box.py) and the operator is
the matrix-free stencil (ops/stencil.py).  State-set mutation becomes pure
elementwise device work:

  * drop            -> clear mask bits (no compaction, no re-indexing)
  * 1-step expand   -> dilate the mask by the legal-move stencil
  * SSA expansion   -> K dilation rounds (the shell after K rounds contains
                       every K-jump SSA path; the FSP criterion + drop trim
                       the surplus) — a deliberate deterministic replacement
                       for the reference's serial Gillespie walks
                       (StateSpace.f90:550-630)
  * box growth      -> double one axis when active cells touch its face
                       (the only host-visible reshape)
"""

from __future__ import annotations

import dataclasses
import time
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .boxspace.box import BoxSpace
from .config import SolverConfig, resolve_solve_dtype
from .krylov.stepper import EPS, initial_carry, make_step_fn
from .models.model import Model
from .ops.stencil import active_touches_face, dilate_mask
from .parallel.multihost import host_gather
from .statespace.drop import drop_mask_device
from .utils.stats import SolverStats, StepRecord


@dataclasses.dataclass
class BoxSolveResult:
    """Final FSP (active cells of the box) and probability vector."""

    states: np.ndarray  #: (n, d) int32 active states
    probabilities: np.ndarray  #: (n,) float64
    t: float
    stats: SolverStats
    box: BoxSpace
    mask: np.ndarray  #: flat bool
    w_flat: np.ndarray  #: flat float64

    def probability(self, state) -> float:
        idx = np.asarray(self.box.flat_index(np.asarray(state)[None, :]))[0]
        if idx < 0 or not self.mask[idx]:
            return 0.0
        return float(self.w_flat[idx])

    @property
    def wsum(self) -> float:
        return float(self.probabilities.sum())

    def marginal(self, species: int) -> np.ndarray:
        """Marginal distribution of one species (utils/queries.py)."""
        from .utils.queries import marginal

        return marginal(self.states, self.probabilities, species)

    def mean(self) -> np.ndarray:
        from .utils.queries import mean

        return mean(self.states, self.probabilities)

    def variance(self) -> np.ndarray:
        from .utils.queries import variance

        return variance(self.states, self.probabilities)


class BoxCmeSolver:
    """Reusable box-backend solver bound to one model.

    Pass ``mesh`` (a 1-D ``jax.sharding.Mesh``) to run the ENTIRE solve —
    the fused adaptive main loop, drop, dilation expansion, and the FSP
    criterion — with the flat cell axis row-partitioned across devices.
    Every state-set mutation on the masked box is elementwise, so the only
    communication is the stencil's shard-boundary halo (GSPMD collective
    permutes), the psum reductions inside Arnoldi/criterion, and the rare
    host-visible box growth (re-embedded on host and re-sharded).  This is
    the multi-chip scaling path of SURVEY.md §2 (parallelism items 1-4);
    the reference is single-core Fortran with no counterpart.
    """

    def __init__(
        self,
        model: Model,
        config: SolverConfig | None = None,
        mesh=None,
    ):
        self.model = model
        self.config = config or SolverConfig()
        self.mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            axis = mesh.axis_names[0]
            self._row = NamedSharding(mesh, PartitionSpec(axis))
            self._rep = NamedSharding(mesh, PartitionSpec())
            # kernel selection under a mesh lives in
            # ops/stencil.select_stencil_matvec: the halo shard_map path
            # wraps the v5 Pallas local kernel in float32 (ops/halo.py);
            # non-halo mesh solves run the GSPMD-partitioned XLA stencil
            # (a single-device pallas_call cannot be GSPMD-partitioned)
        else:
            self._row = self._rep = None
        if self.config.debug_nans:
            jax.config.update("jax_debug_nans", True)
        self._dtype = (
            jnp.float64
            if self.config.resolved_dtype() == "float64"
            else jnp.float32
        )
        self._fns: dict = {}

    def _set_dtype(self, name: str):
        """Re-resolve the solve dtype (the f32 tolerance contract may force
        float64 for a tight fsp_tol); invalidate per-dtype jit caches."""
        dt = jnp.float64 if name == "float64" else jnp.float32
        if dt is not self._dtype:
            self._dtype = dt
            self._fns = {}
            self._warmed = set()

    # ---------------------------------------------------------------- #

    def _put_row(self, arr, dtype=None):
        """Device-put a flat cell-axis array (row-sharded under a mesh)."""
        a = jnp.asarray(arr) if dtype is None else jnp.asarray(arr, dtype)
        if self._row is not None:
            return jax.device_put(a, self._row)
        return a

    def _jit_step(self, step):
        if self.mesh is None:
            return jax.jit(step)
        from .krylov.stepper import StepResult

        carry_rep = jax.tree.map(lambda _: self._rep, _carry_struct())
        return jax.jit(
            step,
            in_shardings=(
                self._row,  # mask
                self._row,  # w
                carry_rep,
                self._rep,
                self._rep,
                self._rep,
            ),
            out_shardings=StepResult(
                w=self._row,
                carry=carry_rep,
                advanced=self._rep,
                iexpand=self._rep,
                t_ssa=self._rep,
                dsum=self._rep,
                wsum=self._rep,
                t_step=self._rep,
                m_used=self._rep,
                err_loc=self._rep,
            ),
        )

    def _jit_advance(self, advance):
        if self.mesh is None:
            return jax.jit(advance)
        from .krylov.advance import AdvanceState

        carry_rep = jax.tree.map(lambda _: self._rep, _carry_struct())
        return jax.jit(
            advance,
            in_shardings=(
                self._row,  # w
                self._row,  # mask
                carry_rep,
                self._rep,
                self._rep,
                self._rep,
            ),
            out_shardings=AdvanceState(
                w=self._row,
                mask=self._row,
                carry=carry_rep,
                event=self._rep,
                steps=self._rep,
                records=self._rep,
                n_drops=self._rep,
                n_expansions=self._rep,
            ),
        )

    # ---------------------------------------------------------------- #

    def _device_bytes_limit(self) -> int | None:
        """Reported per-device memory budget (None when the backend has
        no memory_stats — e.g. CPU, some plugin backends)."""
        if not hasattr(self, "_dev_limit"):
            limit = None
            try:
                st = jax.local_devices()[0].memory_stats()
                if st:
                    limit = int(st.get("bytes_limit", 0)) or None
            except Exception:  # noqa: BLE001
                limit = None
            self._dev_limit = limit
        return self._dev_limit

    def _geometry_config(self, box: BoxSpace) -> SolverConfig:
        """Per-geometry config: m_max clamped so the Krylov basis
        ((m_max+2) box-volume vectors) fits config.max_basis_bytes (and
        config.max_basis_frac of the device memory when reported)."""
        cfg = self.config
        if cfg.max_basis_bytes <= 0:
            return cfg
        budget = cfg.max_basis_bytes
        limit = self._device_bytes_limit()
        if limit:
            budget = min(budget, int(cfg.max_basis_frac * limit))
        itemsize = jnp.dtype(self._dtype).itemsize
        mh = int(budget // (box.volume * itemsize))
        m_eff = min(cfg.m_max, max(cfg.m_min, mh - 2))
        if m_eff == cfg.m_max:
            return cfg
        return dataclasses.replace(cfg, m_max=m_eff)

    def _functions(self, box: BoxSpace):
        """Per-box-geometry jitted step/matvec/dilate/dilate_n (cached)."""
        key = (box.log2, box.axis_of_species)
        if key not in self._fns:
            from .ops.stencil import make_diag_fn, select_stencil_matvec

            matvec = select_stencil_matvec(
                self.model, box, self.config, self._dtype, mesh=self.mesh
            )
            diag = make_diag_fn(self.model, box, jnp.float64)
            R = self.model.n_reactions

            step = make_step_fn(
                lambda mask: (lambda x: matvec(mask, x)),
                self._geometry_config(box),
                op_info=lambda mask: (
                    jnp.sum(mask).astype(jnp.int32),
                    R,
                    # operator-norm proxy for the scaled breakdown
                    # threshold (see stepper.py)
                    2.0 * jnp.max(jnp.where(mask, diag(mask), 0.0)),
                ),
            )

            def dilate_n(m, k):
                def dil(c):
                    mm, i = c
                    return dilate_mask(box, mm), i + 1

                mm, _ = jax.lax.while_loop(
                    lambda c: c[1] < k, dil, (m, jnp.asarray(0, jnp.int32))
                )
                return mm

            def lam_max(m, w):
                support = m & (w.astype(jnp.float64) > self.config.droptol_start)
                support = jnp.where(jnp.any(support), support, m)
                return jnp.max(jnp.where(support, diag(m), 0.0))

            def loss_rate(m, w, inflow, dmask):
                # gross inflow rate into the drop set (anti-thrash gate;
                # see statespace/drop.py drop_loss_rate)
                w64 = w.astype(jnp.float64)
                gross = inflow.astype(jnp.float64) + diag(m) * w64
                return jnp.sum(
                    jnp.where(dmask, jnp.maximum(gross, 0.0), 0.0)
                )

            if self.mesh is None:
                self._fns[key] = (
                    jax.jit(step),
                    jax.jit(matvec),
                    jax.jit(lambda m: dilate_mask(box, m)),
                    jax.jit(dilate_n),
                    jax.jit(lam_max),
                    jax.jit(loss_rate),
                )
            else:
                row, rep = self._row, self._rep
                self._fns[key] = (
                    self._jit_step(step),
                    jax.jit(
                        matvec, in_shardings=(row, row), out_shardings=row
                    ),
                    jax.jit(
                        lambda m: dilate_mask(box, m),
                        in_shardings=(row,),
                        out_shardings=row,
                    ),
                    jax.jit(
                        dilate_n, in_shardings=(row, rep), out_shardings=row
                    ),
                    jax.jit(
                        lam_max, in_shardings=(row, row), out_shardings=rep
                    ),
                    jax.jit(
                        loss_rate,
                        in_shardings=(row, row, row, row),
                        out_shardings=rep,
                    ),
                )
        return self._fns[key]

    def _shrink_if_loose(self, box, mask_np, w_np):
        """Halve axes whose active cells fit in the shrink fraction.

        The box only ever grows in the reference-free design; after a
        transient (or a large drop) the bounding power-of-two can be far
        larger than the support, wasting matvec compute and Krylov-basis
        HBM.  Hysteresis (default 3/8 < 1/2) avoids grow/shrink churn; the
        geometry cache makes revisiting a previous shape free.
        """
        cfg = self.config
        if cfg.box_shrink_fraction <= 0.0:
            return box, mask_np, w_np
        while True:
            m = mask_np.reshape(box.shape)
            changed = False
            for s in range(box.n_species):
                ax = box.axis_of_species[s]
                ext = box.shape[ax]
                if ext <= (1 << cfg.box_min_log2):
                    continue
                other = tuple(i for i in range(len(box.shape)) if i != ax)
                per = m.any(axis=other)
                hi = int(np.nonzero(per)[0].max()) if per.any() else -1
                if hi + 1 <= cfg.box_shrink_fraction * ext:
                    new_box = box.shrink(s)
                    mask_np = np.asarray(
                        new_box.embed(box, jnp.asarray(mask_np), fill=False)
                    )
                    w_np = np.asarray(
                        new_box.embed(box, jnp.asarray(w_np), fill=0.0)
                    )
                    box = new_box
                    changed = True
                    break
            if not changed:
                return box, mask_np, w_np

    def _grow_until_fits(self, box, mask_np, w_np):
        """Grow axes whose faces are touched by active cells."""
        cfg = self.config
        while True:
            touch = active_touches_face(box, mask_np)
            ext = box.extents
            cap_ext = cfg.max_molecules + 1
            touch &= ext < cap_ext
            if not touch.any():
                return box, mask_np, w_np
            sp = int(np.argmax(touch))
            new_box = box.grow(sp)
            if new_box.volume > cfg.max_box_volume:
                raise OverflowError(
                    f"box volume {new_box.volume} exceeds max_box_volume "
                    f"{cfg.max_box_volume} (FSP overflow analog, "
                    "StateSpace.f90:389)"
                )
            mask_np = np.asarray(
                new_box.embed(box, jnp.asarray(mask_np), fill=False)
            )
            w_np = np.asarray(new_box.embed(box, jnp.asarray(w_np), fill=0.0))
            box = new_box

    # ---------------------------------------------------------------- #

    def solve(
        self,
        t: float,
        initial_states: Sequence[Sequence[int]] | None = None,
        p0: Sequence[float] | None = None,
        fsp_tol: float = 1e-4,
        krylov_tol: float = 1e-10,
        verbosity: int | None = None,
        checkpoint_path: str | None = None,
        checkpoint_every: int = 50,
        resume_from: str | None = None,
    ) -> BoxSolveResult:
        cfg = self.config
        verbosity = cfg.verbosity if verbosity is None else verbosity
        wall0 = time.perf_counter()

        if resume_from is not None:
            from .checkpoint import load_checkpoint

            box, mask_np, w_np, carry, t_ck, fsp_tol, krytol = (
                load_checkpoint(resume_from)
            )
            t = t_ck
            self._set_dtype(
                resolve_solve_dtype(
                    cfg, float(fsp_tol), krylov_tol=float(krytol)
                )
            )
            mask = self._put_row(mask_np)
            w = self._put_row(w_np, self._dtype)
        else:
            if initial_states is None:
                raise ValueError("initial_states required unless resuming")
            self._set_dtype(
                resolve_solve_dtype(
                    cfg, float(fsp_tol), krylov_tol=float(krylov_tol)
                )
            )
            init = np.atleast_2d(np.asarray(initial_states, dtype=np.int64))
            if p0 is None:
                p0 = np.zeros(init.shape[0])
                p0[0] = 1.0
            p0 = np.asarray(p0, dtype=np.float64)

            box = BoxSpace.for_model(
                self.model.stoichiometry, init, cfg.box_min_log2
            )
            mask_np = np.zeros(box.volume, dtype=bool)
            w_np = np.zeros(box.volume, dtype=np.float64)
            idx = np.asarray(box.flat_index(init))
            mask_np[idx] = True
            w_np[idx] = p0

            # start-up expansion (KrylovSolver.f90:130-134)
            for _ in range(cfg.init_onestep_expansions):
                box, mask_np, w_np = self._grow_until_fits(box, mask_np, w_np)
                dilate = self._functions(box)[2]
                # host_gather, not np.asarray: under a multi-host mesh the
                # dilated mask spans non-addressable devices
                mask_np = host_gather(dilate(self._put_row(mask_np)))
            box, mask_np, w_np = self._grow_until_fits(box, mask_np, w_np)

            mask = self._put_row(mask_np)
            w = self._put_row(w_np, self._dtype)

            krytol = float(krylov_tol)
            if krytol <= EPS:
                krytol = float(np.sqrt(EPS))

            beta = float(np.linalg.norm(w_np))
            if beta == 0.0:
                raise ValueError("initial probability vector is zero")
            carry = initial_carry(beta, abs(t), krytol, cfg.anorm, cfg.m_min)
        self._ckpt = (checkpoint_path, int(checkpoint_every), [0])

        t_out = jnp.asarray(float(t), jnp.float64)
        fsptol_j = jnp.asarray(float(fsp_tol), jnp.float64)
        krytol_j = jnp.asarray(krytol, jnp.float64)

        stats = SolverStats()
        hard_cap = cfg.mxstep if cfg.mxstep > 0 else 1_000_000

        if cfg.fused_steps:
            box, mask, w, carry, stats = self._solve_fused(
                box, mask, w, carry, t_out, fsptol_j, krytol_j, stats,
                hard_cap, verbosity, wall0,
            )
            return self._finalize(
                box, mask, w, carry, stats, float(t), wall0
            )

        iteration = 0
        (step_jit, matvec_jit, dilate_jit, dilate_n_jit, lam_jit,
         loss_rate_jit) = self._functions(box)

        while float(carry.t_now) < abs(t):
            iteration += 1
            if iteration > hard_cap:
                raise RuntimeError(
                    f"exceeded {hard_cap} attempted steps (IFLAG=1 analog)"
                )

            res = step_jit(mask, w, carry, t_out, fsptol_j, krytol_j)
            w, carry = res.w, res.carry
            if int(carry.iflag) == 3:
                raise RuntimeError(
                    "local Krylov error stayed NaN through the bounded "
                    "tau/5 retry (iflag=3) — basis/H numerically "
                    "corrupted (inf/NaN propensity, overscaled expm, or "
                    "device-state corruption); inspect the operator"
                )
            if int(carry.iflag) == 2:
                raise RuntimeError(
                    f"step rejected more than mxreject="
                    f"{self.config.mxreject} times (IFLAG=2, "
                    "KrylovSolver.f90:392-397); requested tolerance likely "
                    "unattainable"
                )
            advanced = bool(res.advanced)
            iexpand = bool(res.iexpand)
            dsum = float(res.dsum)
            dropped = 0

            # ---- drop = clear mask bits (KrylovSolver.f90:509-511) -----
            if advanced and dsum > 0.0:
                inflow = matvec_jit(mask, w)
                dmask, count, _ = drop_mask_device(
                    w.astype(jnp.float64),
                    inflow.astype(jnp.float64),
                    mask,
                    jnp.asarray(dsum, jnp.float64),
                    droptol_start=cfg.droptol_start,
                    inflow_guard=cfg.inflow_guard,
                )
                count = int(count)
                n_active = int(jnp.sum(mask))
                # anti-thrash gate, same policy as the fused box loop's
                # drop_inline (krylov/advance.py): gross-leak-rate bound
                # with a memory-pressure escape on the box volume
                loss = float(loss_rate_jit(mask, w, inflow, dmask))
                rate_budget = (
                    cfg.drop_rate_frac * float(fsptol_j) / abs(float(t))
                )
                pressure = n_active >= cfg.drop_pressure_frac * mask.size
                if count > cfg.drop_fraction * n_active and (
                    loss <= rate_budget or pressure
                ):
                    dropped_mass = jnp.sum(
                        jnp.where(dmask, w.astype(jnp.float64), 0.0)
                    )
                    mask = mask & ~dmask
                    w = jnp.where(dmask, 0.0, w)
                    dropped = count
                    stats.n_drops += 1
                    beta_new = jnp.sqrt(jnp.sum(w * w))
                    carry = carry._replace(
                        beta=beta_new.astype(jnp.float64),
                        hump=jnp.maximum(carry.hump, beta_new),
                        spent=carry.spent + dropped_mass,
                    )

            # ---- expansion = K dilation rounds + face growth -----------
            # K event-scales with the SSA horizon (SSA_EXTENDER analog)
            if iexpand and float(carry.t_now) < abs(t):
                from .ops.stencil import expansion_rounds

                k = expansion_rounds(
                    lam_jit(mask, w),
                    jnp.asarray(float(res.t_ssa), jnp.float64),
                    cfg.box_expand_rounds,
                    cfg.box_expand_rounds_max,
                )
                mask = dilate_n_jit(mask, k)
                mask_np = host_gather(mask)
                w_np = host_gather(w).astype(np.float64)
                new_box, mask_np, w_np = self._grow_until_fits(
                    box, mask_np, w_np
                )
                if new_box is not box:
                    box = new_box
                    (step_jit, matvec_jit, dilate_jit, dilate_n_jit,
                     lam_jit, loss_rate_jit) = self._functions(box)
                    mask = self._put_row(mask_np)
                    w = self._put_row(w_np, self._dtype)
                    # one more dilation round inside the grown box
                    mask = dilate_jit(mask)
                stats.n_expansions += 1

            rec = StepRecord(
                nstep=int(carry.nstep),
                fsp_size=int(jnp.sum(mask)),
                t_step=float(res.t_step),
                t_new=float(carry.t_new),
                t_now=float(carry.t_now),
                m=int(res.m_used),
                wsum=float(res.wsum),
                err_loc=float(res.err_loc),
                advanced=advanced,
                expanded=iexpand,
                dropped=dropped,
                wall_s=time.perf_counter() - wall0,
            )
            stats.records.append(rec)
            if verbosity:
                print(rec.format(), flush=True)
            self._maybe_checkpoint(
                box, mask, w, carry, t_out, fsptol_j, krytol_j
            )

        return self._finalize(box, mask, w, carry, stats, float(t), wall0)

    # ---------------------------------------------------------------- #

    def _advance(self, box: BoxSpace, growable: tuple[int, ...]):
        """Cached jitted fused-loop function per (box, growable)."""
        from .krylov.advance import make_advance_fn

        budget = self.config.max_steps_per_call
        # checkpointing needs host re-entry at least every checkpoint_every
        # attempted steps
        if getattr(self, "_ckpt", (None,))[0] is not None:
            budget = min(budget, self._ckpt[1])
        key = ("adv", box.log2, box.axis_of_species, growable, budget)
        if key not in self._fns:
            self._fns[key] = self._jit_advance(
                make_advance_fn(
                    self.model,
                    box,
                    self._geometry_config(box),
                    growable,
                    budget,
                    self._dtype,
                    mesh=self.mesh,
                )
            )
        return self._fns[key]

    def _growable(self, box: BoxSpace) -> tuple[int, ...]:
        cfg = self.config
        return tuple(
            int(s)
            for s in range(box.n_species)
            if box.extents[s] < cfg.max_molecules + 1
            and box.grow(int(s)).volume <= cfg.max_box_volume
        )

    def _warm_cache_async(self, box: BoxSpace):
        """Pre-compile the fused advance for every one-axis growth of
        ``box`` in a daemon thread, overlapping the (remote) XLA compile
        with on-device stepping.  The compiled executable is discarded —
        the point is to warm JAX's persistent compilation cache so the
        foreground recompile after a growth event is a disk load instead
        of a minutes-long compile (the round-1 latency wall)."""
        if jax.default_backend() == "cpu" or not self.config.fused_steps:
            return
        import threading

        warmed = self._warmed = getattr(self, "_warmed", set())

        def work(candidates):
            for nb in candidates:
                key = (nb.log2, nb.axis_of_species)
                if key in warmed:
                    continue
                warmed.add(key)
                try:
                    adv = self._advance(nb, self._growable(nb))
                    avals = (
                        jax.ShapeDtypeStruct((nb.volume,), self._dtype),
                        jax.ShapeDtypeStruct((nb.volume,), jnp.bool_),
                        jax.tree.map(
                            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
                            _carry_struct(),
                        ),
                        jax.ShapeDtypeStruct((), jnp.float64),
                        jax.ShapeDtypeStruct((), jnp.float64),
                        jax.ShapeDtypeStruct((), jnp.float64),
                    )
                    adv.lower(*avals).compile()
                except Exception:  # noqa: BLE001 — warming is best-effort
                    pass

        cands = []
        for s in self._growable(box):
            nb = box.grow(int(s))
            if (nb.log2, nb.axis_of_species) not in warmed:
                cands.append(nb)
        if cands:
            threading.Thread(
                target=work, args=(cands,), daemon=True
            ).start()

    def _solve_fused(
        self, box, mask, w, carry, t_out, fsptol_j, krytol_j, stats,
        hard_cap, verbosity, wall0,
    ):
        """Fused device main loop; host re-entry on growth/budget only."""
        from .krylov.advance import (
            EVENT_BUDGET,
            EVENT_DONE,
            EVENT_FAIL,
            EVENT_GROW,
        )

        total_steps = 0
        last_box = None
        stalled_grows = 0
        while True:
            growable = self._growable(box)
            adv = self._advance(box, growable)
            if box is not last_box:
                # overlap the next geometries' compiles with stepping
                self._warm_cache_async(box)
                last_box = box
            seg0 = time.perf_counter()
            st = adv(w, mask, carry, t_out, fsptol_j, krytol_j)
            w, mask, carry = st.w, st.mask, st.carry
            stats.n_drops += int(st.n_drops)
            stats.n_expansions += int(st.n_expansions)
            nsteps = int(st.steps)
            total_steps += nsteps
            recs = np.asarray(st.records)[:nsteps]  # forces device sync
            # per-step wall inside a fused device segment is not observable;
            # record the amortized segment wall so timing observability does
            # not silently vanish on the production path
            seg_wall = (time.perf_counter() - seg0) / max(nsteps, 1)
            for row in recs:
                rec = StepRecord(
                    nstep=int(row[0]),
                    fsp_size=int(row[1]),
                    t_step=float(row[2]),
                    t_new=float(row[3]),
                    t_now=float(row[4]),
                    m=int(row[5]),
                    wsum=float(row[6]),
                    err_loc=float(row[7]),
                    advanced=bool(row[8]),
                    expanded=bool(row[9]),
                    dropped=int(row[10]),
                    wall_s=seg_wall,
                )
                stats.records.append(rec)
                if verbosity:
                    print(rec.format(), flush=True)
            self._maybe_checkpoint(
                box, mask, w, carry, t_out, fsptol_j, krytol_j
            )
            event = int(st.event)
            if event == EVENT_FAIL:
                if int(carry.iflag) == 3:
                    raise RuntimeError(
                        "local Krylov error stayed NaN through the bounded "
                        "tau/5 retry (iflag=3) — basis/H numerically "
                        "corrupted (inf/NaN propensity, overscaled expm, or "
                        "device-state corruption); inspect the operator"
                    )
                raise RuntimeError(
                    f"step rejected more than mxreject="
                    f"{self.config.mxreject} times (IFLAG=2, "
                    "KrylovSolver.f90:392-397); requested tolerance likely "
                    "unattainable"
                )
            if event == EVENT_DONE:
                break
            if total_steps > hard_cap:
                raise RuntimeError(
                    f"exceeded {hard_cap} attempted steps (IFLAG=1 analog)"
                )
            # any accepted progress clears the stall counter, regardless of
            # which event ended the segment (a BUDGET segment with steps
            # between two zero-step GROWs is real progress)
            if nsteps > 0:
                stalled_grows = 0
            if event == EVENT_GROW:
                # no-progress guard: growth events that accept no step can
                # only help when the FSP budget failure is truncation loss;
                # if integration has started (nstep >= 1) and growth keeps
                # accepting nothing, the criterion is unattainable (e.g. an
                # f32 budget exhausted by noise) — fail loudly instead of
                # growing to the volume cap
                stalled_grows = stalled_grows + 1 if nsteps == 0 else 0
                if stalled_grows >= 16 and int(carry.nstep) >= 1:
                    raise RuntimeError(
                        f"{stalled_grows} consecutive state-space growths "
                        "without an accepted step at t="
                        f"{float(carry.t_now):g}; the requested fsp_tol is "
                        "likely unattainable at this precision — use "
                        "dtype='float64' or loosen fsp_tol (FSP criterion, "
                        "KrylovSolver.f90:442-495)"
                    )
                mask_np = host_gather(mask)
                w_np = host_gather(w).astype(np.float64)
                new_box, mask_np, w_np = self._grow_until_fits(
                    box, mask_np, w_np
                )
                # other axes may have gone loose (post-transient)
                new_box, mask_np, w_np = self._shrink_if_loose(
                    new_box, mask_np, w_np
                )
                if new_box is not box:
                    box = new_box
                    mask = self._put_row(mask_np)
                    w = self._put_row(w_np, self._dtype)
                    mask = self._functions(box)[2](mask)
                else:
                    # face touched but nothing growable: states at the cap
                    # simply truncate (reference MAXNUMBERMOLECULES analog);
                    # continue without growth
                    pass
            elif event == EVENT_BUDGET:
                mask_np = host_gather(mask)
                w_np = host_gather(w).astype(np.float64)
                new_box, mask_np, w_np = self._shrink_if_loose(
                    box, mask_np, w_np
                )
                if new_box is not box:
                    box = new_box
                    mask = self._put_row(mask_np)
                    w = self._put_row(w_np, self._dtype)
        return box, mask, w, carry, stats

    def _maybe_checkpoint(self, box, mask, w, carry, t_out, fsptol, krytol):
        path, every, last = self._ckpt
        if path is None:
            return
        nstep = int(carry.nstep)
        if nstep - last[0] >= every:
            from .checkpoint import save_checkpoint

            save_checkpoint(
                path, box, host_gather(mask),
                host_gather(w).astype(np.float64), jax.device_get(carry),
                float(t_out), float(fsptol), float(krytol),
            )
            last[0] = nstep

    def _finalize(self, box, mask, w, carry, stats, t, wall0):
        stats.nmult = int(carry.nmult)
        stats.nexph = int(carry.nexph)
        stats.nscale = int(carry.nscale)
        stats.nstep = int(carry.nstep)
        stats.nreject = int(carry.nreject)
        stats.ibrkflag = int(carry.ibrkflag)
        stats.iflag = int(carry.iflag)
        stats.mbrkdwn = int(carry.mbrkdwn)
        stats.tbrkdwn = float(carry.tbrkdwn)
        stats.step_min = float(carry.step_min)
        stats.step_max = float(carry.step_max)
        stats.x_error = float(carry.x_error)
        stats.s_error = float(carry.s_error)
        stats.t_final = float(carry.t_now)
        stats.mass_spent = float(carry.spent)
        stats.hump_ratio = float(carry.hump / carry.vnorm)
        stats.final_norm_ratio = float(carry.beta / carry.vnorm)
        stats.wall_s = time.perf_counter() - wall0

        mask_np = host_gather(mask)
        # report clipped probabilities (the f32 path keeps the signed
        # vector in-solve to avoid accumulating clip bias)
        w_np = np.maximum(host_gather(w).astype(np.float64), 0.0)
        active = np.nonzero(mask_np)[0]
        states = np.asarray(
            jnp.stack(
                box.species_counts(jnp.asarray(active), jnp.int32), axis=1
            )
        )
        stats.final_fsp_size = int(active.size)
        return BoxSolveResult(
            states=states,
            probabilities=w_np[active],
            t=float(t),
            stats=stats,
            box=box,
            mask=mask_np,
            w_flat=w_np,
        )


def _carry_struct():
    """A StepCarry pytree used only for sharding-structure construction."""
    return initial_carry(1.0, 1.0, 1e-8, 1.0, 10)


def solve_cme_box(
    model: Model,
    t: float,
    initial_states=None,
    p0=None,
    fsp_tol: float = 1e-4,
    krylov_tol: float = 1e-10,
    config: SolverConfig | None = None,
    verbosity: int = 0,
    checkpoint_path: str | None = None,
    checkpoint_every: int = 50,
    resume_from: str | None = None,
    mesh=None,
) -> BoxSolveResult:
    solver = BoxCmeSolver(model, config, mesh=mesh)
    return solver.solve(
        t, initial_states, p0, fsp_tol, krylov_tol, verbosity=verbosity,
        checkpoint_path=checkpoint_path, checkpoint_every=checkpoint_every,
        resume_from=resume_from,
    )
