"""Multi-device tests on the virtual 8-device CPU mesh.

Asserts shard-count invariance: the row-partitioned execution produces the
same numbers as single-device execution (SURVEY.md §5 test strategy (d)).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from krylovfspssa_tpu.config import SolverConfig
from krylovfspssa_tpu.krylov.stepper import initial_carry, make_step_fn
from krylovfspssa_tpu.models.library import bursting_gene_model, toggle_file_model
from krylovfspssa_tpu.ops.operator import build_operator
from krylovfspssa_tpu.ops.spmv import spmv
from krylovfspssa_tpu.parallel.sharded import (
    make_mesh,
    shard_operator,
    sharded_matvec,
    sharded_step_fn,
)
from krylovfspssa_tpu.statespace.encoding import StateEncoder
from krylovfspssa_tpu.statespace.table import StateTable


def _toggle_op(capacity=512, grid=18):
    model = toggle_file_model()  # TestSolverFromFile values preset
    xs, ys = np.meshgrid(np.arange(grid), np.arange(grid), indexing="ij")
    states = np.stack([xs.ravel(), ys.ravel()], axis=1).astype(np.int32)
    enc = StateEncoder.for_model(2, 10_000)
    t = StateTable.from_states(states, enc, capacity=capacity)
    op = build_operator(
        t.states, t.sorted_keys, t.sorted_to_row,
        jnp.asarray(t.n, jnp.int32),
        model.propensities, jnp.asarray(model.stoichiometry), enc,
    )
    return model, t, op


def test_devices_available():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"


def test_sharded_matvec_matches_single():
    model, t, op = _toggle_op()
    mesh = make_mesh(8)
    op_sh = shard_operator(op, mesh)
    rng = np.random.default_rng(0)
    x = np.zeros(t.capacity)
    x[: t.n] = rng.random(t.n)
    y_single = np.asarray(spmv(op, jnp.asarray(x)))
    mv = sharded_matvec(mesh)
    y_sharded = np.asarray(mv(op_sh, jnp.asarray(x)))
    np.testing.assert_allclose(y_sharded, y_single, rtol=1e-13, atol=1e-13)


def test_sharded_step_matches_single():
    config = SolverConfig()
    model, t, op = _toggle_op()
    mesh = make_mesh(8)

    w = np.zeros(t.capacity)
    w[0] = 1.0
    w = jnp.asarray(w)
    carry = initial_carry(1.0, 10.0, 1e-10, 1.0, config.m_min)
    args = (
        jnp.asarray(10.0),
        jnp.asarray(1e-4),
        jnp.asarray(1e-10),
    )

    step_single = jax.jit(
        make_step_fn(lambda op: (lambda x: spmv(op, x)), config)
    )
    res1 = step_single(op, w, carry, *args)

    op_sh = shard_operator(op, mesh)
    step_sh = sharded_step_fn(mesh, config)
    res2 = step_sh(op_sh, w, carry, *args)

    np.testing.assert_allclose(
        np.asarray(res2.w), np.asarray(res1.w), rtol=1e-12, atol=1e-14
    )
    assert float(res2.carry.t_now) == pytest.approx(float(res1.carry.t_now))
    assert float(res2.wsum) == pytest.approx(float(res1.wsum), rel=1e-12)
    assert int(res2.m_used) == int(res1.m_used)
    # the sharded result is actually row-partitioned over the mesh
    shard_devs = {s.device for s in res2.w.addressable_shards}
    assert len(shard_devs) == 8


def test_sharded_box_step_matches_single():
    """Box backend: the row-partitioned stencil step reproduces the
    single-device step (shard-count invariance for the flagship path)."""
    from krylovfspssa_tpu.boxspace.box import BoxSpace
    from krylovfspssa_tpu.ops.stencil import make_stencil_matvec
    from krylovfspssa_tpu.parallel.sharded import (
        sharded_box_step_fn,
        sharded_dilate_fn,
    )

    config = SolverConfig()
    model = bursting_gene_model()
    box = BoxSpace.for_model(model.stoichiometry, [[0, 0]])
    for s in range(model.n_species):
        while box.extents[s] < 16:
            box = box.grow(s)

    mask_np = np.zeros(box.volume, dtype=bool)
    idx = int(np.asarray(box.flat_index(np.array([[0, 0]])))[0])
    mask_np[idx] = True
    w_np = np.zeros(box.volume)
    w_np[idx] = 1.0

    mesh = make_mesh(8)
    dilate = sharded_dilate_fn(mesh, box)
    mask = jnp.asarray(mask_np)
    for _ in range(5):
        mask = dilate(mask)
    w = jnp.asarray(w_np)
    carry = initial_carry(1.0, 10.0, 1e-10, 1.0, config.m_min)
    args = (jnp.asarray(10.0), jnp.asarray(1e-4), jnp.asarray(1e-10))

    matvec = make_stencil_matvec(model, box, jnp.float64)
    step_single = jax.jit(
        make_step_fn(
            lambda m: (lambda x: matvec(m, x)),
            config,
            op_info=lambda m: (jnp.sum(m).astype(jnp.int32),
                               model.n_reactions),
        )
    )
    res1 = step_single(mask, w, carry, *args)

    step_sh = sharded_box_step_fn(mesh, model, box, config)
    res2 = step_sh(mask, w, carry, *args)

    np.testing.assert_allclose(
        np.asarray(res2.w), np.asarray(res1.w), rtol=1e-12, atol=1e-14
    )
    assert float(res2.carry.t_now) == pytest.approx(float(res1.carry.t_now))
    assert float(res2.wsum) == pytest.approx(float(res1.wsum), rel=1e-12)
    shard_devs = {s.device for s in res2.w.addressable_shards}
    assert len(shard_devs) == 8


def test_box_full_solve_shard_invariance_fused():
    """THE multi-chip bar (SURVEY §5(d), VERDICT r1 item 1): a complete
    end-to-end box solve — fused adaptive main loop, drop, dilation
    expansion, box growth — runs with the cell axis row-partitioned over
    8 devices and reproduces the single-device solve.  Final probabilities
    agree to reduction-reordering noise (partial sums + psum), orders of
    magnitude below every solver tolerance; the adaptive trajectory
    (steps, box geometry) is identical."""
    from krylovfspssa_tpu.boxsolver import solve_cme_box

    model = bursting_gene_model()
    kw = dict(fsp_tol=1e-4, krylov_tol=1e-8)
    r1 = solve_cme_box(model, 20.0, [[0, 0]], **kw)
    r8 = solve_cme_box(model, 20.0, [[0, 0]], mesh=make_mesh(8), **kw)
    assert r8.box.shape == r1.box.shape
    assert r8.stats.nstep == r1.stats.nstep
    assert r8.stats.n_expansions == r1.stats.n_expansions
    np.testing.assert_allclose(r8.w_flat, r1.w_flat, rtol=0, atol=1e-9)
    assert abs(r8.wsum - r1.wsum) < 1e-10
    assert r8.wsum >= 1.0 - 1e-4


def test_box_full_solve_shard_invariance_stepwise():
    """Same kernel, non-fused (one device call per attempted step)
    orchestration, use_halo=False: GSPMD partitioning of the stencil.

    Contract: SOLUTION-level agreement, not trajectory identity.  The
    sharded run's f64 Arnoldi dots are partial-sums + psum, whose
    association order differs from the single-device linear reduce by
    O(ulp).  Diagnosed round 3: trajectories are bit-identical through
    step 12, an ulp-level err_loc difference appears at step 7 (4.4575e-11
    vs 4.45748e-11), and at step 13 it flips a round_2sig quantization
    boundary (tau 0.33 vs 0.32), after which the two adaptive trajectories
    legitimately diverge (24 vs 23 steps) while both satisfy every solver
    tolerance.  Reduction reassociation under sharding is not a contract
    XLA offers, so trajectory identity cannot be one of ours; the fused
    test above keeps the stronger assertion because its single-jit main
    loop happens to reduce shard-invariantly on this geometry."""
    from krylovfspssa_tpu.boxsolver import solve_cme_box

    model = toggle_file_model()
    cfg = SolverConfig(fused_steps=False, use_halo=False)
    kw = dict(fsp_tol=1e-4, krylov_tol=1e-8, config=cfg)
    r1 = solve_cme_box(model, 5.0, [[0, 0]], **kw)
    r8 = solve_cme_box(model, 5.0, [[0, 0]], mesh=make_mesh(8), **kw)
    assert r8.box.shape == r1.box.shape
    assert r8.wsum >= 1.0 - 1e-4
    assert r8.wsum == pytest.approx(r1.wsum, abs=1e-6)
    # the final masks may differ (drop timing is trajectory-dependent) but
    # every differing cell carries < droptol mass; solutions agree well
    # inside fsp_tol
    np.testing.assert_allclose(r8.w_flat, r1.w_flat, rtol=0, atol=1e-6)


def test_halo_full_solve_agreement():
    """The halo-exchange sharded solve agrees with single-device at the
    solution level (its multiply ordering may legally pick different
    adaptive steps, so the bar is solution agreement within tolerances,
    not trajectory identity)."""
    from krylovfspssa_tpu.boxsolver import solve_cme_box

    model = toggle_file_model()
    cfg = SolverConfig(fused_steps=False)
    kw = dict(fsp_tol=1e-4, krylov_tol=1e-8, config=cfg)
    r1 = solve_cme_box(model, 5.0, [[0, 0]], **kw)
    r8 = solve_cme_box(model, 5.0, [[0, 0]], mesh=make_mesh(8), **kw)
    assert r8.box.shape == r1.box.shape
    assert r8.wsum >= 1.0 - 1e-4
    np.testing.assert_allclose(r8.w_flat, r1.w_flat, rtol=0, atol=1e-6)


def test_halo_exchange_matvec_matches_single():
    """Explicit ppermute halo-exchange SpMV (ops/halo.py) vs the
    single-device stencil — SURVEY §2 parallelism item 2."""
    from krylovfspssa_tpu.boxspace.box import BoxSpace
    from krylovfspssa_tpu.models.library import goutsias_model
    from krylovfspssa_tpu.ops.halo import halo_sharded_matvec_jit
    from krylovfspssa_tpu.ops.stencil import make_stencil_matvec

    model = goutsias_model()
    box = BoxSpace.for_model(model.stoichiometry, [[2, 6, 0, 2, 0, 0]])
    for s, tgt in enumerate([16, 16, 8, 4, 4, 4]):
        while box.extents[s] < tgt:
            box = box.grow(s)
    mesh = make_mesh(8)
    mv = halo_sharded_matvec_jit(model, box, mesh, jnp.float64)
    assert mv is not None, "goutsias box must qualify for the halo path"
    rng = np.random.default_rng(5)
    mask = jnp.asarray(rng.random(box.volume) < 0.7)
    x = jnp.asarray(rng.random(box.volume))
    ref = np.asarray(make_stencil_matvec(model, box, jnp.float64)(mask, x))
    got = mv(mask, x)
    shard_devs = {s.device for s in got.addressable_shards}
    assert len(shard_devs) == 8
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-13, atol=1e-13)


def test_cli_devices_flag(capsys):
    """kfs solve --devices N builds a mesh over the first N local devices
    and runs the full sharded solve (VERDICT r2 item 8: multi-chip must be
    reachable from the CLI, the reference's capability bar being its
    drivers, TestSolverFromFile.f90)."""
    import json as _json

    from krylovfspssa_tpu.cli import main

    rc = main([
        "solve", "bursting_gene", "--t", "1", "--fsp-tol", "1e-4",
        "--devices", "4", "--json",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    rec = _json.loads(out.strip().splitlines()[-1])
    assert rec["wsum"] >= 1.0 - 1e-4


def test_halo_pallas_local_matches_single():
    """The halo-exchange SpMV with the Pallas LOCAL kernel (v6 preferred,
    v5 fallback; interpret mode) matches the single-device XLA stencil —
    VERDICT r2 item 5: the sharded path must not pay the XLA-stencil
    penalty on TPU.  Float32 compare (the Pallas kernels are f32-only)."""
    from krylovfspssa_tpu.boxspace.box import BoxSpace
    from krylovfspssa_tpu.models.library import goutsias_model
    from krylovfspssa_tpu.ops.halo import make_halo_stencil_matvec
    from krylovfspssa_tpu.ops.stencil import make_stencil_matvec

    model = goutsias_model()
    box = BoxSpace.for_model(model.stoichiometry, [[2, 6, 0, 2, 0, 0]])
    for s, tgt in enumerate([32, 16, 8, 4, 4, 4]):
        while box.extents[s] < tgt:
            box = box.grow(s)
    mesh = make_mesh(8)
    mv = make_halo_stencil_matvec(
        model, box, mesh, jnp.float32, use_pallas="always",
        pallas_interpret=True,
    )
    assert mv is not None and getattr(mv, "_pallas_local", False), (
        "the goutsias box must qualify for the Pallas halo local kernel"
    )
    rng = np.random.default_rng(23)
    mask = jnp.asarray(rng.random(box.volume) < 0.7)
    x = jnp.asarray(rng.random(box.volume), jnp.float32)
    ref = np.asarray(
        make_stencil_matvec(model, box, jnp.float32)(mask, x)
    )
    got = jax.jit(mv)(mask, x)
    shard_devs = {s.device for s in got.addressable_shards}
    assert len(shard_devs) == 8
    scale = float(np.max(np.abs(ref)))
    np.testing.assert_allclose(
        np.asarray(got), ref, atol=2e-6 * scale
    )


def test_halo_local_v6_selected_with_global_scalars():
    """On the halo-test Goutsias geometry the v6 LOCAL kernel must apply
    (scalarized row factors with a GLOBALLY indexed per-tile table) so
    the sharded hot loop matches the single-chip kernel generation."""
    from krylovfspssa_tpu.boxspace.box import BoxSpace
    from krylovfspssa_tpu.models.library import goutsias_model
    from krylovfspssa_tpu.ops.pallas_stencil import (
        make_pallas_local_matvec_v6,
    )

    model = goutsias_model()
    box = BoxSpace.for_model(model.stoichiometry, [[2, 6, 0, 2, 0, 0]])
    for s, tgt in enumerate([32, 16, 8, 4, 4, 4]):
        while box.extents[s] < tgt:
            box = box.grow(s)
    mv = make_pallas_local_matvec_v6(model, box, 8, interpret=True)
    assert mv is not None
    assert sum(mv._has_scal) == 6  # the six D-touching reactions


def test_table_full_solve_shard_invariance():
    """End-to-end TABLE-backend solve (gather-ELL operator, the
    reference's own sparse format, StateSpace.f90:13-17) row-partitioned
    over 8 devices: drop compaction, SSA/1-step expansion, and capacity
    growth all execute under the mesh (VERDICT r2 item 6).  Contract:
    solution-level agreement (see the stepwise box test above for why
    trajectory identity is not assertable under reduction resharding)."""
    from krylovfspssa_tpu.solver import solve_cme

    model = bursting_gene_model()
    kw = dict(fsp_tol=1e-4, krylov_tol=1e-8)
    r1 = solve_cme(model, 10.0, [[0, 0]], **kw)
    r8 = solve_cme(model, 10.0, [[0, 0]], mesh=make_mesh(8), **kw)
    assert r8.wsum >= 1.0 - 1e-4
    assert r8.wsum == pytest.approx(r1.wsum, abs=1e-6)
    d1 = {tuple(s): p for s, p in zip(r1.states, r1.probabilities)}
    d8 = {tuple(s): p for s, p in zip(r8.states, r8.probabilities)}
    for k in set(d1) | set(d8):
        assert d8.get(k, 0.0) == pytest.approx(d1.get(k, 0.0), abs=1e-6)
