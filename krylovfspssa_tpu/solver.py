"""Top-level Krylov-FSP-SSA CME solver (table backend).

Host-side orchestration of the device kernels, replicating
``CME_SOLVE``/``DGEXPV_FSP`` (``/root/reference/src/fsp/
KrylovSolver.f90:7-653``):

  * initialization: seed states, operator assembly, 5 rounds of 1-step
    reachability (KrylovSolver.f90:130-134), first step size;
  * the main loop (default, ``config.fused_steps``): up to
    ``max_steps_per_call`` attempted steps run inside ONE jitted
    ``lax.while_loop`` dispatch (krylov/advance.py
    make_table_advance_fn), with DROP_STATES applied inline as a
    soft row mask; the host re-enters only to
      - run SSA + 1-step expansion and rebuild the operator
        (the state-table mutation is host-side by design),
      - stream step records / write checkpoints,
      - stop at t_out.
    With ``fused_steps=False`` each attempted step is one device call
    (the round-3 structure; kept for debugging and latency-insensitive
    backends).

The state table itself is pure host (numpy + native hash) bookkeeping;
device consumers receive its arrays as jit arguments.  Capacities are
bucketed powers of two, so jitted programs recompile only on bucket
growth (log2 many times per solve), and the next bucket's executables
are pre-compiled in a background thread while stepping.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .config import SolverConfig, resolve_solve_dtype
from .krylov.stepper import EPS, initial_carry, make_step_fn
from .models.model import Model
from .ops.operator import build_operator
from .ops.spmv import spmv
from .statespace.drop import drop_loss_rate, drop_mask_device
from .statespace.encoding import StateEncoder
from .statespace.expand import onestep_extend, ssa_extend
from .statespace.table import StateTable
from .utils.stats import SolverStats, StepRecord


@dataclasses.dataclass
class SolveResult:
    """Final FSP and probability vector (the reference's FSP_OUT)."""

    states: np.ndarray  #: (n, d) int32
    probabilities: np.ndarray  #: (n,) float64
    t: float
    stats: SolverStats
    table: StateTable

    def probability(self, state) -> float:
        """Point probability lookup (POINTWISE_FSP parity,
        StateSpace.f90:96-114): 0 for states outside the projection."""
        idx = int(np.asarray(self.table.lookup_states(np.asarray(state)[None, :]))[0])
        return float(self.probabilities[idx]) if idx >= 0 else 0.0

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


class _EllVec:
    """Device-vector layout for the gather-ELL operator: vector index ==
    table row, padded to the capacity bucket."""

    def __init__(self, table: StateTable):
        self._table = table
        self.cells = table.capacity

    def put(self, w_rows: np.ndarray) -> np.ndarray:
        out = np.zeros(self.cells, dtype=np.float64)
        out[: min(len(w_rows), self.cells)] = w_rows[: self.cells]
        return out

    def take(self, w_np) -> np.ndarray:
        return np.asarray(w_np, dtype=np.float64)[: self._table.n]

    def active0(self):
        return jnp.arange(self.cells) < self._table.n

    def keep_rows(self, cells_np) -> np.ndarray:
        return np.asarray(cells_np)[: self._table.n]


class _PencilVec:
    """Device-vector layout for the pencil operator: vector index ==
    pencil cell (rows x 128 lanes), padded to the rows bucket
    (ops/pencil.py)."""

    def __init__(self, layout, cells: int):
        self.layout = layout
        self.cells = cells
        flat = layout.mask.reshape(-1)
        m = np.zeros(cells, dtype=bool)
        m[: flat.shape[0]] = flat
        self._mask = m

    def put(self, w_rows: np.ndarray) -> np.ndarray:
        out = np.zeros(self.cells, dtype=np.float64)
        out[self.layout.slot_of_state[: len(w_rows)]] = w_rows
        return out

    def take(self, w_np) -> np.ndarray:
        return np.asarray(w_np, dtype=np.float64)[
            self.layout.slot_of_state
        ]

    def active0(self):
        return jnp.asarray(self._mask)

    def keep_rows(self, cells_np) -> np.ndarray:
        return np.asarray(cells_np)[self.layout.slot_of_state]


class CmeSolver:
    """Reusable solver bound to one model (jit caches persist across solves).

    Pass ``mesh`` (a 1-D ``jax.sharding.Mesh``) to run the ENTIRE solve
    with the state-row axis partitioned across devices: the gather-ELL
    operator, probability vector, and Krylov basis shard by rows; drop
    compaction, SSA/1-step expansion, and capacity growth keep their host
    orchestration (the table mutation is host-side by design) but every
    rebuilt device array lands back on the mesh.  This is the sharded
    end-to-end path for the reference's own sparse format
    (/root/reference/src/state_space/StateSpace.f90:13-17), covering
    non-separable models the box/halo path cannot take."""

    def __init__(
        self, model: Model, config: SolverConfig | None = None, mesh=None
    ):
        self.model = model
        self.config = config or SolverConfig()
        self.mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            axis = mesh.axis_names[0]
            self._row = NamedSharding(mesh, PartitionSpec(axis))
            self._rep = NamedSharding(mesh, PartitionSpec())
        else:
            self._row = self._rep = None
        if self.config.debug_nans:
            jax.config.update("jax_debug_nans", True)
        self.encoder = StateEncoder.for_model(
            model.n_species, self.config.max_molecules
        )
        self._stoich = np.asarray(model.stoichiometry, dtype=np.int64)

        def props_fn(states):
            return model.propensities(states)

        self._props_fn = props_fn
        self._dtype = None
        self._set_dtype(self.config.resolved_dtype())
        if mesh is None:
            self._matvec = jax.jit(spmv)
        else:
            from .parallel.sharded import sharded_matvec

            self._matvec = sharded_matvec(mesh)

    def _put_row(self, arr, dtype=None):
        a = jnp.asarray(arr) if dtype is None else jnp.asarray(arr, dtype)
        if self._row is not None:
            return jax.device_put(a, self._row)
        return a

    def _set_dtype(self, name: str):
        """(Re-)resolve the solve dtype (the f32 tolerance contract may
        force float64 for a tight fsp_tol); rebuild per-dtype jit caches."""
        dt = jnp.float64 if name == "float64" else jnp.float32
        if dt is self._dtype:
            return
        self._dtype = dt
        enc = self.encoder
        stoich = self._stoich
        props_fn = self._props_fn

        def build_op(states, sorted_keys, sorted_to_row, n):
            return build_operator(
                states, sorted_keys, sorted_to_row, n,
                props_fn, stoich, enc, dt,
            )

        if self.mesh is None:
            self._build_op = jax.jit(build_op)
        else:
            from .parallel.sharded import operator_shardings

            self._build_op = jax.jit(
                build_op, out_shardings=operator_shardings(self.mesh)
            )
        self._steps: dict = {}

    def _m_eff(self, capacity: int) -> int:
        """m_max clamped so the Krylov basis ((m_max+2, capacity)) fits
        config.max_basis_bytes."""
        cfg = self.config
        m_eff = cfg.m_max
        if cfg.max_basis_bytes > 0:
            itemsize = jnp.dtype(self._dtype).itemsize
            mh = int(cfg.max_basis_bytes // (capacity * itemsize))
            m_eff = min(cfg.m_max, max(cfg.m_min, mh - 2))
        return m_eff

    def _cfg_eff(self, m_eff: int) -> SolverConfig:
        cfg = self.config
        return cfg if m_eff == cfg.m_max else dataclasses.replace(
            cfg, m_max=m_eff
        )

    def _advance(self, capacity: int, budget: int):
        """Jitted fused multi-step loop for the current capacity bucket
        (krylov/advance.py make_table_advance_fn)."""
        from .krylov.advance import TableAdvanceState, make_table_advance_fn

        m_eff = self._m_eff(capacity)
        key = ("adv", m_eff, budget)
        if key not in self._steps:
            adv = make_table_advance_fn(
                self._cfg_eff(m_eff), budget,
                max_states=self.config.max_states,
            )
            if self.mesh is None:
                self._steps[key] = jax.jit(adv)
            else:
                from .krylov.stepper import initial_carry
                from .parallel.sharded import operator_shardings

                carry_rep = jax.tree.map(
                    lambda _: self._rep, initial_carry(1.0, 1.0, 1e-8, 1.0, 10)
                )
                self._steps[key] = jax.jit(
                    adv,
                    in_shardings=(
                        operator_shardings(self.mesh),
                        self._row,  # w
                        self._row,  # active
                        carry_rep,
                        self._rep,
                        self._rep,
                        self._rep,
                    ),
                    out_shardings=TableAdvanceState(
                        w=self._row,
                        active=self._row,
                        carry=carry_rep,
                        event=self._rep,
                        steps=self._rep,
                        records=self._rep,
                        n_drops=self._rep,
                        advanced=self._rep,
                        iexpand=self._rep,
                        t_ssa=self._rep,
                        dsum=self._rep,
                    ),
                )
        return self._steps[key]

    def _warm_next_bucket(self, capacity: int, budget: int):
        """Pre-compile the fused advance + operator build for the NEXT
        capacity bucket in a daemon thread, overlapping the (remote) XLA
        compile with on-device stepping — the same latency lever as the
        box backend's _warm_cache_async (round-3: each foreground bucket
        compile on the remote backend costs tens of seconds).

        DISABLED by default (config.warm_next_bucket): on the remote
        'axon' backend a background compile running concurrently with
        main-thread execution was observed to corrupt in-flight device
        state (round-4 flagship: wsum collapsed 1.0 -> 0.08 two segments
        after the warm thread started compiling the next bucket; the
        identical trajectory is healthy with the thread off and on CPU).
        Enable only on backends whose client is known compile-safe under
        concurrency."""
        if not self.config.warm_next_bucket:
            return
        if jax.default_backend() == "cpu":
            return
        cfg = self.config
        nxt = capacity * cfg.capacity_growth
        if cfg.max_states is not None and capacity >= cfg.max_states:
            return
        key = ("warm", nxt, budget, self._dtype)
        if key in self._steps:
            return
        self._steps[key] = True
        import threading

        dt = self._dtype
        R = self.model.n_reactions
        d = self.model.n_species
        W = self.encoder.n_words
        build_op = self._build_op
        steps_dict = self._steps

        def work():
            try:
                from .ops.operator import CmeOperator

                sds = jax.ShapeDtypeStruct
                key_shape = (nxt,) if W == 1 else (nxt, W)
                op_aval = CmeOperator(
                    diag=sds((nxt,), dt),
                    pred_idx=sds((nxt, R), jnp.int32),
                    pred_prop=sds((nxt, R), dt),
                    props=sds((nxt, R), dt),
                    succ_idx=sds((nxt, R), jnp.int32),
                    succ_legal=sds((nxt, R), jnp.bool_),
                    n=sds((), jnp.int32),
                )
                carry_aval = jax.tree.map(
                    lambda x: sds(jnp.shape(x), jnp.asarray(x).dtype),
                    initial_carry(1.0, 1.0, 1e-8, 1.0, self.config.m_min),
                )
                scal = sds((), jnp.float64)
                adv = self._advance(nxt, budget)
                adv.lower(
                    op_aval,
                    sds((nxt,), dt),
                    sds((nxt,), jnp.bool_),
                    carry_aval,
                    scal,
                    scal,
                    scal,
                ).compile()
                build_op.lower(
                    sds((nxt, d), jnp.int32),
                    sds(key_shape, jnp.int64),
                    sds((nxt,), jnp.int32),
                    sds((), jnp.int32),
                ).compile()
            except Exception:  # noqa: BLE001 — warming is best-effort
                steps_dict.pop(key, None)

        threading.Thread(target=work, daemon=True).start()

    def _step(self, op_active, w, *args):
        """Jitted single attempted step for the current capacity.

        Takes the (op, active) pair and compiles the SAME masked step
        program as the fused loop (krylov/advance.py
        make_masked_table_step) so fused and stepwise trajectories are
        numerically identical."""
        from .krylov.advance import make_masked_table_step

        m_eff = self._m_eff(w.shape[0])
        if m_eff not in self._steps:
            step = make_masked_table_step(self._cfg_eff(m_eff))
            if self.mesh is None:
                self._steps[m_eff] = jax.jit(step)
            else:
                from .krylov.stepper import StepResult, initial_carry
                from .parallel.sharded import operator_shardings

                carry_rep = jax.tree.map(
                    lambda _: self._rep, initial_carry(1.0, 1.0, 1e-8, 1.0, 10)
                )
                self._steps[m_eff] = jax.jit(
                    step,
                    in_shardings=(
                        (operator_shardings(self.mesh), self._row),
                        self._row,
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
        return self._steps[m_eff](op_active, w, *args)

    # ------------------------------------------------------------------ #

    def _choose_operator(self, table: StateTable):
        """Resolve the table-operator representation for this solve
        (config.table_operator).  The pencil form (ops/pencil.py) avoids
        XLA:TPU's serialized per-element gathers (~30 ns each — ~160 ms
        per matvec at the 600k-state flagship support) at ~3x cell
        padding; "auto" picks it on TPU single-device solves when the
        initial layout stays efficient.  Mesh solves stay on ell (the
        sharded path's shardings are row-layout)."""
        cfg = self.config
        self._pencil_lane = None
        mode = cfg.table_operator
        if mode == "ell" or self.mesh is not None:
            return
        if mode == "auto" and jax.default_backend() in ("cpu", "gpu"):
            return  # CPU/GPU vectorize the ELL gathers fine
        from .ops.pencil import build_pencil_layout

        states = np.asarray(table.states[: table.n])
        lane = cfg.pencil_lane_species
        if lane is None:
            lane = int(np.argmax(states.max(axis=0)))
        layout = build_pencil_layout(states, lane)
        over = layout.n_cells / max(table.n, 1)
        if mode == "auto" and over > cfg.pencil_max_overcoverage:
            return
        self._pencil_lane = lane

    def _operator(self, table: StateTable):
        """(operator, vector-layout) for the current state set."""
        if getattr(self, "_pencil_lane", None) is not None:
            return self._pencil_operator(table)
        op = self._build_op(
            table.states,
            table.sorted_keys,
            table.sorted_to_row,
            jnp.asarray(table.n, jnp.int32),
        )
        return op, _EllVec(table)

    def _pencil_operator(self, table: StateTable):
        """Build the pencil operator: host computes the small index
        tables (layout + source rows); per-cell fields build in one
        jitted device call per rows-bucket (ops/pencil.py)."""
        from .ops.pencil import (
            LANES,
            build_pencil_layout,
            host_index_tables,
            make_pencil_operator_builder,
        )

        lane = self._pencil_lane
        states = np.asarray(table.states[: table.n])
        layout = build_pencil_layout(states, lane)
        src_a, src_b = host_index_tables(layout, self._stoich)
        rows = layout.n_rows
        rows_b = max(64, 1 << int(np.ceil(np.log2(max(rows, 1)))))
        nb = len(layout.bases)
        nb_b = max(64, 1 << int(np.ceil(np.log2(max(nb, 1)))))
        d = self.model.n_species
        R = self._stoich.shape[0]
        bases_p = np.zeros((nb_b, d - 1), np.int32)
        bases_p[:nb] = layout.bases
        row_base_p = np.full(rows_b, -1, np.int32)
        row_base_p[:rows] = layout.row_base
        row_block_p = np.zeros(rows_b, np.int32)
        row_block_p[:rows] = layout.row_block
        src_a_p = np.full((R, rows_b), -1, np.int32)
        src_a_p[:, :rows] = src_a
        src_b_p = np.full((R, rows_b), -1, np.int32)
        src_b_p[:, :rows] = src_b
        cells = rows_b * LANES
        mask_p = np.zeros(cells, bool)
        mask_p[: rows * LANES] = layout.mask.reshape(-1)

        key = ("pencil_build", lane)
        if key not in self._steps:
            self._steps[key] = make_pencil_operator_builder(
                self.model, self._stoich, lane,
                self.encoder.species_cap, self._dtype,
            )
        op = self._steps[key](
            jnp.asarray(bases_p),
            jnp.asarray(row_base_p),
            jnp.asarray(row_block_p),
            jnp.asarray(src_a_p),
            jnp.asarray(src_b_p),
            jnp.asarray(mask_p),
            jnp.asarray(table.n, jnp.int32),
        )
        return op, _PencilVec(layout, cells)

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
    ) -> SolveResult:
        """Solve dp/dt = A p from the initial distribution to time ``t``.

        Args:
          t: final time (T_OUT).
          initial_states: (k, d) seed states of the projection.
          p0: (k,) initial probabilities (default: delta at the first state —
            the drivers' ``p0(1)=1`` convention, TestSolverFromFile.f90:29).
          fsp_tol: total FSP truncation error budget (FSPTOL).
          krylov_tol: local Krylov error tolerance (EXP_TOL/KRYTOL).
          checkpoint_path / checkpoint_every: write a resumable snapshot
            every N accepted steps.
          resume_from: continue from a previous table-backend snapshot
            (t/tolerances come from the snapshot).
        """
        cfg = self.config
        verbosity = cfg.verbosity if verbosity is None else verbosity
        wall0 = time.perf_counter()

        if resume_from is not None:
            from .checkpoint import load_table_checkpoint

            (states_ck, w_ck, carry, t, fsp_tol, krytol, rng_state) = (
                load_table_checkpoint(resume_from)
            )
            self._set_dtype(
                resolve_solve_dtype(
                    cfg, float(fsp_tol), krylov_tol=float(krytol)
                )
            )
            table = StateTable.from_states(
                states_ck, self.encoder, cfg.init_capacity, cfg.max_states
            )
            self._choose_operator(table)
            op, vl = self._operator(table)
            w = self._put_row(
                vl.put(np.asarray(w_ck, np.float64)), self._dtype
            )
            rng = jnp.asarray(rng_state)
        else:
            if initial_states is None:
                raise ValueError("initial_states required unless resuming")
            self._set_dtype(
                resolve_solve_dtype(
                    cfg, float(fsp_tol), krylov_tol=float(krylov_tol)
                )
            )
            init = np.atleast_2d(np.asarray(initial_states, dtype=np.int32))
            if p0 is None:
                p0 = np.zeros(init.shape[0])
                p0[0] = 1.0
            p0 = np.asarray(p0, dtype=np.float64)

            table = StateTable.from_states(
                init, self.encoder, cfg.init_capacity, cfg.max_states
            )

            # start-up expansion (KrylovSolver.f90:130-134)
            for _ in range(cfg.init_onestep_expansions):
                table, _ = onestep_extend(table, self._stoich, cfg.max_states)
            w_rows = np.zeros(table.n, dtype=np.float64)
            rows = np.asarray(table.lookup_states(init))
            w_rows[rows] = p0

            self._choose_operator(table)
            op, vl = self._operator(table)
            w = self._put_row(vl.put(w_rows), self._dtype)

            # tolerance floor (KrylovSolver.f90:171)
            krytol = float(krylov_tol)
            if krytol <= EPS:
                krytol = float(np.sqrt(EPS))

            beta = float(np.linalg.norm(w_rows))
            if beta == 0.0:
                raise ValueError("initial probability vector is zero")
            carry = initial_carry(beta, abs(t), krytol, cfg.anorm, cfg.m_min)
            rng = jax.random.PRNGKey(cfg.seed)

        t_out = jnp.asarray(float(t), jnp.float64)
        fsptol_j = jnp.asarray(float(fsp_tol), jnp.float64)
        krytol_j = jnp.asarray(krytol, jnp.float64)

        stats = SolverStats()
        hard_cap = cfg.mxstep if cfg.mxstep > 0 else 1_000_000
        iteration = 0
        nan_resets = 0
        last_ckpt = [int(carry.nstep)]

        def maybe_checkpoint(table_, w_rows_fn, carry_, rng_, keep=None):
            # w_rows_fn: lazy () -> (n,) float64 table-row vector (the
            # D2H + layout mapping only happens when a snapshot is due)
            if checkpoint_path is None:
                return
            nstep = int(carry_.nstep)
            if nstep - last_ckpt[0] >= int(checkpoint_every):
                from .checkpoint import save_table_checkpoint

                states_ck = np.asarray(table_.states[: table_.n])
                w_ck = w_rows_fn()
                if keep is not None and not keep.all():
                    states_ck = states_ck[keep]
                    w_ck = w_ck[keep]
                save_table_checkpoint(
                    checkpoint_path,
                    states_ck,
                    w_ck,
                    jax.device_get(carry_),
                    float(t_out),
                    float(fsptol_j),
                    float(krytol_j),
                    np.asarray(rng_),
                )
                last_ckpt[0] = nstep

        if cfg.fused_steps:
            budget = cfg.max_steps_per_call
            if checkpoint_path is not None:
                budget = min(budget, int(checkpoint_every))
            table, w_rows, carry, rng = self._solve_fused(
                table, w, vl, carry, rng, t, t_out, fsptol_j, krytol_j,
                stats, hard_cap, verbosity, wall0, op, maybe_checkpoint,
                budget,
            )
            return self._finalize(table, w_rows, carry, stats, t, wall0)

        while float(carry.t_now) < abs(t):
            iteration += 1
            if iteration > hard_cap:
                stats.nstep = int(carry.nstep)
                raise RuntimeError(
                    f"exceeded {hard_cap} attempted steps (IFLAG=1 analog)"
                )

            active = vl.active0()
            if self._row is not None:
                active = jax.device_put(active, self._row)
            res = self._step((op, active), w, carry, t_out, fsptol_j, krytol_j)
            w, carry = res.w, res.carry
            if int(carry.iflag) == 3:
                # persistent-NaN step (poisoned controller scalars, e.g.
                # a NaN t_new from degenerate adaptivity history).  The
                # probability vector is CLEAN on this path (the stepper
                # reverts w to beta*v1), so sanitize the carry from w
                # and retry; only a repeat failure is fatal.
                carry = self._sanitize_carry(carry, w, t_out, krytol_j)
                nan_resets += 1
                if nan_resets > 5:
                    raise RuntimeError(
                        "local Krylov error stayed NaN through the "
                        "bounded tau/5 retry (iflag=3) five times — "
                        "basis/H numerically corrupted (inf/NaN "
                        "propensity, overscaled expm, or device-state "
                        "corruption); inspect the operator"
                    )
                if verbosity:
                    print(
                        f"NaN step at t={float(carry.t_now):g}; "
                        "controller state reset", flush=True,
                    )
                continue
            if int(carry.iflag) == 2:
                raise RuntimeError(
                    f"step rejected more than mxreject={cfg.mxreject} times "
                    "(IFLAG=2, KrylovSolver.f90:392-397); requested "
                    "tolerance likely unattainable"
                )
            advanced = bool(res.advanced)
            iexpand = bool(res.iexpand)
            dsum = float(res.dsum)
            dropped = 0

            # ---- drop surplus mass (KrylovSolver.f90:509-511) ----------
            if advanced and dsum > 0.0:
                inflow = self._matvec(op, w)
                w64 = w.astype(jnp.float64)
                inflow64 = inflow.astype(jnp.float64)
                mask, count, _ = drop_mask_device(
                    w64,
                    inflow64,
                    active,
                    jnp.asarray(dsum, jnp.float64),
                    droptol_start=cfg.droptol_start,
                    inflow_guard=cfg.inflow_guard,
                )
                count = int(count)
                # anti-thrash gate, same policy as the fused path's
                # drop_inline (krylov/advance.py): only commit when the
                # drop set's gross leak rate fits the scaled FSP budget
                # rate, unless under memory pressure
                loss_rate = float(
                    drop_loss_rate(
                        w64, inflow64, op.diag.astype(jnp.float64), mask
                    )
                )
                rate_budget = (
                    cfg.drop_rate_frac * float(fsptol_j) / abs(float(t_out))
                )
                pressure = cfg.max_states is not None and (
                    table.n >= cfg.drop_pressure_frac * cfg.max_states
                )
                if count > cfg.drop_fraction * table.n and (
                    loss_rate <= rate_budget or pressure
                ):
                    keep = ~vl.keep_rows(np.asarray(mask))
                    w_rows = vl.take(w)
                    dropped_mass = float(w_rows[~keep].sum())
                    w_kept = w_rows[keep]
                    table, _ = table.compact(keep)
                    op, vl = self._operator(table)
                    w = self._put_row(vl.put(w_kept), self._dtype)
                    dropped = count
                    stats.n_drops += 1
                    beta_new = float(np.linalg.norm(w_kept))
                    carry = carry._replace(
                        beta=jnp.asarray(beta_new, jnp.float64),
                        hump=jnp.maximum(carry.hump, beta_new),
                        spent=carry.spent + dropped_mass,
                    )

            # ---- SSA + 1-step expansion (KrylovSolver.f90:516-534) -----
            if iexpand and float(carry.t_now) < abs(t):
                rng, sub = jax.random.split(rng)
                n_before = table.n
                w_rows = vl.take(w)
                table, _ = ssa_extend(
                    table,
                    self._props_fn,
                    self._stoich,
                    float(res.t_ssa),
                    sub,
                    cfg.ssa_max_steps,
                    cfg.max_states,
                )
                table, _ = onestep_extend(table, self._stoich, cfg.max_states)
                if table.n != n_before:
                    w_rows = np.concatenate(
                        [w_rows, np.zeros(table.n - n_before)]
                    )
                    op, vl_new = self._operator(table)
                    if not (
                        isinstance(vl, _EllVec)
                        and isinstance(vl_new, _EllVec)
                        and vl_new.cells == vl.cells
                    ):
                        # layout changed (pencil re-slotting or capacity
                        # growth): re-place the vector; appended states
                        # carry probability zero
                        w = self._put_row(vl_new.put(w_rows), self._dtype)
                    vl = vl_new
                stats.n_expansions += 1

            rec = StepRecord(
                nstep=int(carry.nstep),
                fsp_size=table.n,
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
            maybe_checkpoint(table, lambda: vl.take(w), carry, rng)

        return self._finalize(table, vl.take(w), carry, stats, t, wall0)

    def _sanitize_carry(self, carry, w, t_out, krytol_j):
        """Rebuild the controller scalars of a NaN-poisoned carry from
        the (clean) probability vector: fresh step size, reset
        adaptivity history, counters preserved."""
        import math

        from .krylov.stepper import first_stepsize

        cfg = self.config
        beta = float(jnp.sqrt(jnp.sum(w.astype(jnp.float64) ** 2)))
        fresh = initial_carry(
            beta, abs(float(t_out)) - float(carry.t_now),
            float(krytol_j), cfg.anorm, cfg.m_min,
        )

        def pick(cur, fb):
            c = float(cur)
            return cur if math.isfinite(c) else fb

        return carry._replace(
            t_new=pick(carry.t_new, fresh.t_new),
            beta=jnp.asarray(beta, jnp.float64),
            m_new=carry.m_new,
            omega=fresh.omega,
            t_old=fresh.t_old,
            m_old=fresh.m_old,
            order=fresh.order,
            kfactor=fresh.kfactor,
            orderold=fresh.orderold,
            kestold=fresh.kestold,
            iflag=jnp.asarray(0, jnp.int32),
        )

    def _finalize(self, table, w_rows, carry, stats, t, wall0) -> SolveResult:
        # ---- final statistics (KrylovSolver.f90:554-573) ---------------
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
        stats.final_fsp_size = table.n
        stats.wall_s = time.perf_counter() - wall0

        # report clipped probabilities (the f32 path keeps the signed
        # vector in-solve to avoid accumulating clip bias)
        w_final = np.maximum(np.asarray(w_rows, dtype=np.float64), 0.0)
        return SolveResult(
            states=np.asarray(table.states[: table.n]),
            probabilities=w_final,
            t=float(t),
            stats=stats,
            table=table,
        )

    def _solve_fused(
        self, table, w, vl, carry, rng, t, t_out, fsptol_j, krytol_j,
        stats, hard_cap, verbosity, wall0, op, maybe_checkpoint, budget,
    ):
        """Fused device main loop for the table backend: many attempted
        steps per dispatch (krylov/advance.py make_table_advance_fn); the
        host re-enters only on SSA-expansion events, the per-call step
        budget, or completion.  Soft-dropped rows (the inline DROP_STATES)
        are compacted out of the host table lazily at expansion events."""
        from .krylov.advance import (
            EVENT_BUDGET,
            EVENT_DONE,
            EVENT_EXPAND,
            EVENT_FAIL,
        )

        cfg = self.config
        total_attempted = 0
        nan_resets = 0

        def make_active():
            a = vl.active0()
            return a if self._row is None else jax.device_put(a, self._row)

        active = make_active()
        while True:
            # resume-at-completion (t_now >= t_out, e.g. a checkpoint
            # written on the final step): nothing to integrate — a tau=0
            # attempt is degenerate (omega = err/0)
            if float(carry.t_now) >= abs(float(t)):
                break
            adv = self._advance(vl.cells, budget)
            if isinstance(vl, _EllVec):
                self._warm_next_bucket(vl.cells, budget)
            seg0 = time.perf_counter()
            st = adv(op, w, active, carry, t_out, fsptol_j, krytol_j)
            w, active, carry = st.w, st.active, st.carry
            nsteps = int(st.steps)
            total_attempted += nsteps
            stats.n_drops += int(st.n_drops)
            recs = np.asarray(st.records)[:nsteps]  # forces device sync
            # per-step wall inside a fused segment is not observable; the
            # amortized segment wall is recorded instead (documented on
            # StepRecord.wall_s)
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
            keep = vl.keep_rows(np.asarray(active))
            maybe_checkpoint(table, lambda: vl.take(w), carry, rng, keep)
            event = int(st.event)
            if event == EVENT_FAIL:
                if int(carry.iflag) == 3:
                    # recoverable: sanitize the poisoned controller
                    # scalars from the clean vector and re-enter (see
                    # the stepwise path)
                    nan_resets += 1
                    if nan_resets <= 5:
                        carry = self._sanitize_carry(
                            carry, w, t_out, krytol_j
                        )
                        if verbosity:
                            print(
                                f"NaN step at t={float(carry.t_now):g}; "
                                "controller state reset", flush=True,
                            )
                        continue
                    raise RuntimeError(
                        "local Krylov error stayed NaN through the bounded "
                        "tau/5 retry (iflag=3) five times — basis/H "
                        "numerically corrupted (inf/NaN propensity, "
                        "overscaled expm, or device-state corruption); "
                        "inspect the operator"
                    )
                raise RuntimeError(
                    f"step rejected more than mxreject={cfg.mxreject} times "
                    "(IFLAG=2, KrylovSolver.f90:392-397); requested "
                    "tolerance likely unattainable"
                )
            if event == EVENT_DONE:
                break
            if total_attempted > hard_cap:
                stats.nstep = int(carry.nstep)
                raise RuntimeError(
                    f"exceeded {hard_cap} attempted steps (IFLAG=1 analog)"
                )
            if event == EVENT_EXPAND:
                # host mutation: compact soft-dropped rows, then SSA +
                # 1-step expansion and operator rebuild
                # (KrylovSolver.f90:516-534)
                n_before = table.n
                w_rows = vl.take(w)
                # device-state invariant: every path out of the stepper
                # leaves ~unit mass (accepted steps satisfy the FSP
                # criterion; abandoned steps revert to beta*v1).  A gross
                # violation means the device state was corrupted (e.g. a
                # second client on a remote TPU tunnel) — fail loudly
                # instead of spiraling through ever-larger expansions.
                wsum_host = float(w_rows.sum())
                if not (0.5 < wsum_host < 1.5):
                    raise RuntimeError(
                        f"probability mass {wsum_host:.6g} at a host "
                        f"re-entry (t={float(carry.t_now):g}, n={table.n}, "
                        f"capacity={table.capacity}) — device state "
                        "corrupted; on remote TPU backends check for a "
                        "concurrent process on the tunnel"
                    )
                compacted = not keep.all()
                if compacted:
                    w_rows = w_rows[keep]
                    table, _ = table.compact(keep)
                rng, sub = jax.random.split(rng)
                table, added_ssa = ssa_extend(
                    table,
                    self._props_fn,
                    self._stoich,
                    float(st.t_ssa),
                    sub,
                    cfg.ssa_max_steps,
                    cfg.max_states,
                )
                table, added_1s = onestep_extend(
                    table, self._stoich, cfg.max_states
                )
                if verbosity >= 2:
                    print(
                        f"EXPAND t={float(carry.t_now):g} wsum={wsum_host:.9f}"
                        f" n {n_before}->{table.n} (+{added_ssa} ssa, "
                        f"+{added_1s} 1-step) cap {table.capacity} "
                        f"t_ssa={float(st.t_ssa):g}"
                        + (" [compacted]" if compacted else ""),
                        flush=True,
                    )
                if compacted or table.n != len(w_rows):
                    w_rows = np.concatenate(
                        [w_rows, np.zeros(table.n - len(w_rows))]
                    )
                    op, vl_new = self._operator(table)
                    if compacted or not (
                        isinstance(vl, _EllVec)
                        and isinstance(vl_new, _EllVec)
                        and vl_new.cells == vl.cells
                    ):
                        # re-place the vector unless the row layout is
                        # unchanged (ELL append within the same bucket:
                        # appended states already read as zero padding)
                        w = self._put_row(vl_new.put(w_rows), self._dtype)
                    vl = vl_new
                active = make_active()
                stats.n_expansions += 1
            # EVENT_BUDGET: stream records / checkpoint and re-enter

        # drop soft-dropped rows from the final table (their probability
        # is already zero; the legacy path compacts at drop time)
        keep = vl.keep_rows(np.asarray(active))
        w_rows = vl.take(w)
        if not keep.all():
            w_rows = w_rows[keep]
            table, _ = table.compact(keep)
        return table, w_rows, carry, rng


def solve_cme(
    model: Model,
    t: float,
    initial_states,
    p0=None,
    fsp_tol: float = 1e-4,
    krylov_tol: float = 1e-10,
    config: SolverConfig | None = None,
    verbosity: int = 0,
    mesh=None,
    checkpoint_path: str | None = None,
    checkpoint_every: int = 50,
    resume_from: str | None = None,
) -> SolveResult:
    """One-shot convenience wrapper (CME_SOLVE parity)."""
    solver = CmeSolver(model, config, mesh=mesh)
    return solver.solve(
        t, initial_states, p0, fsp_tol, krylov_tol, verbosity=verbosity,
        checkpoint_path=checkpoint_path, checkpoint_every=checkpoint_every,
        resume_from=resume_from,
    )


