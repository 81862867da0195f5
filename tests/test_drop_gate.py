"""Drop/expand limit-cycle fix (config.drop_rate_frac) regression tests.

Round 4 found a control-path defect in the table backend: the inline
DROP_STATES kept removing a boundary shell whose members each pass the
reference's PER-STATE inflow guard (StateSpace.f90:486-495 — their net
derivative (A w)_i ~ 0 at quasi-equilibrium) while JOINTLY carrying
enough gross throughput that the next step's FSP criterion always
failed and SSA re-added the same shell: toggle t=200 took 618 steps /
444 expansions instead of ~134/11.  The fix gates drop commits on the
drop set's total gross inflow rate (A w + D w) fitting a fraction of
the FSP budget rate fsp_tol/t_out (semantics anchor:
StateSpace.f90:486-495 + KrylovSolver.f90:442-458; the gate is a
documented extension, PARITY.md).

These tests pin (a) the post-fix step/expansion counts, (b) the gate's
uniform application across the fused and stepwise table paths (they
must produce the same trajectory), and (c) the unit behavior of
drop_loss_rate.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from krylovfspssa_tpu.config import SolverConfig
from krylovfspssa_tpu.models.library import toggle_file_model
from krylovfspssa_tpu.solver import solve_cme
from krylovfspssa_tpu.statespace.drop import drop_loss_rate


def test_drop_loss_rate_unit():
    """Gross inflow = (A w)_i + D_i w_i, clipped at 0, summed over the set."""
    w = jnp.asarray([0.5, 0.25, 0.25, 0.0])
    inflow = jnp.asarray([0.1, -0.2, 0.0, 0.3])  # A w (net derivative)
    diag = jnp.asarray([1.0, 2.0, 4.0, 8.0])  # positive outflow D
    dmask = jnp.asarray([False, True, True, True])
    # rows 1,2,3: max(-0.2 + 0.5, 0) + max(0 + 1.0, 0) + max(0.3 + 0, 0)
    expect = 0.3 + 1.0 + 0.3
    got = float(drop_loss_rate(w, inflow, diag, dmask))
    assert got == pytest.approx(expect, rel=1e-12)
    # empty drop set leaks nothing
    none = jnp.zeros(4, bool)
    assert float(drop_loss_rate(w, inflow, diag, none)) == 0.0


def test_limit_cycle_regression_toggle_t200():
    """Post-fix toggle t=200 economics (measured r4: 134 steps / 11
    expansions; pre-fix: 618 / 444).  Generous headroom so legitimate
    controller changes don't trip it, but any limit-cycle regression
    (hundreds of steps) fails loudly."""
    model = toggle_file_model()
    res = solve_cme(
        model, 200.0, [[0, 0]], fsp_tol=1e-4, krylov_tol=1e-10,
        config=SolverConfig(),
    )
    assert res.wsum >= 1.0 - 1e-4
    assert res.stats.nstep <= 200, res.stats.nstep
    assert res.stats.n_expansions <= 30, res.stats.n_expansions


def test_table_fused_matches_stepwise():
    """The fused device while_loop and the host-orchestrated step loop
    must follow the same POLICY on the table backend — same drop and
    expansion decisions, same final FSP, probabilities to solver-error
    level (mirrors test_box.py::test_fused_loop_matches_host_loop).

    Unlike the box backend, bitwise trajectory equality is out of reach
    here: XLA fuses the gather-matvec reductions differently inside a
    while_loop body than in a standalone jit (err_loc differs at the
    e-15 level from step one), and stepwise compaction reorders rows
    where the fused path soft-drops in place, changing reduction order
    at the first drop regardless.  The discrete m/tau controller
    amplifies those ulps into different-but-equally-valid step
    sequences; both satisfy the identical tolerance contract, so the
    assertions below pin the policy, not the rounding."""
    model = toggle_file_model()
    kw = dict(fsp_tol=1e-4, krylov_tol=1e-10)
    res_s = solve_cme(model, 60.0, [[0, 0]],
                      config=SolverConfig(fused_steps=False), **kw)
    res_f = solve_cme(model, 60.0, [[0, 0]],
                      config=SolverConfig(fused_steps=True), **kw)
    assert res_f.stats.n_drops == res_s.stats.n_drops
    assert res_f.stats.n_expansions == res_s.stats.n_expansions
    assert res_f.stats.final_fsp_size == res_s.stats.final_fsp_size
    # step economics in the same regime (no limit cycle on either path)
    assert abs(res_f.stats.nstep - res_s.stats.nstep) <= max(
        10, 0.2 * res_s.stats.nstep
    )
    # the operator-scaled happy-breakdown can fire at path-dependent
    # points, so agreement is at solver-error level (well inside
    # fsp_tol), not reduction-rounding level
    assert res_f.wsum == pytest.approx(res_s.wsum, abs=1e-6)
    d_s = {tuple(s): p for s, p in zip(res_s.states, res_s.probabilities)}
    d_f = {tuple(s): p for s, p in zip(res_f.states, res_f.probabilities)}
    for k in set(d_s) | set(d_f):
        assert d_f.get(k, 0.0) == pytest.approx(d_s.get(k, 0.0), abs=2e-6)


@pytest.mark.slow
def test_gate_off_reproduces_limit_cycle():
    """With the gate disabled (drop_rate_frac=inf) the toggle t=200 run
    degrades to the round-4 defect trajectory — evidence the gate is the
    operative fix, not an incidental change."""
    model = toggle_file_model()
    res = solve_cme(
        model, 200.0, [[0, 0]], fsp_tol=1e-4, krylov_tol=1e-10,
        config=SolverConfig(drop_rate_frac=float("inf")),
    )
    assert res.stats.nstep >= 400, res.stats.nstep
    assert res.stats.n_expansions >= 100, res.stats.n_expansions


def test_pressure_escape_commits_drops():
    """Near the max_states budget the gate must yield (running out of
    state budget is worse than an extra expansion epoch): with a tiny
    drop_rate_frac every drop is gate-suppressed unless the pressure
    escape fires, so a run under memory pressure must still drop."""
    model = toggle_file_model()
    cfg = SolverConfig(
        drop_rate_frac=0.0,  # gate alone would suppress every drop
        drop_pressure_frac=0.0,  # pressure escape always on
    )
    res = solve_cme(model, 200.0, [[0, 0]], fsp_tol=1e-4,
                    krylov_tol=1e-10, config=cfg)
    assert res.wsum >= 1.0 - 1e-4
    assert res.stats.n_drops >= 1


def test_gate_suppression_is_conservative():
    """drop_rate_frac=0 with the pressure escape off suppresses every
    drop; the result must still satisfy the FSP tolerance contract (kept
    states only reduce truncation error) and keep more states."""
    model = toggle_file_model()
    base = solve_cme(model, 100.0, [[0, 0]], fsp_tol=1e-4,
                     krylov_tol=1e-10, config=SolverConfig())
    nodrop = solve_cme(
        model, 100.0, [[0, 0]], fsp_tol=1e-4, krylov_tol=1e-10,
        config=SolverConfig(drop_rate_frac=0.0, drop_pressure_frac=2.0),
    )
    assert nodrop.stats.n_drops == 0
    assert nodrop.wsum >= 1.0 - 1e-4
    assert nodrop.stats.final_fsp_size >= base.stats.final_fsp_size
    # the two solutions agree within the FSP tolerance
    d_b = {tuple(s): p for s, p in zip(base.states, base.probabilities)}
    for s, p in zip(nodrop.states, nodrop.probabilities):
        if p > 1e-6:
            assert d_b.get(tuple(s), 0.0) == pytest.approx(p, abs=2e-4)
