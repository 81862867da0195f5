"""Pallas stencil SpMV kernel vs the XLA stencil (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from krylovfspssa_tpu.boxspace.box import BoxSpace
from krylovfspssa_tpu.models.library import (
    goutsias_model,
    toggle_file_model,
    toggle_programmatic_model,
)
from krylovfspssa_tpu.ops.pallas_stencil import (
    make_pallas_stencil_matvec,
    make_pallas_stencil_matvec_v2,
    pallas_applicable,
)
from krylovfspssa_tpu.ops.stencil import make_stencil_matvec


def _grown_box(model, x0, target):
    box = BoxSpace.for_model(model.stoichiometry, x0)
    for s in range(model.n_species):
        while box.extents[s] < target:
            box = box.grow(s)
    return box


@pytest.mark.parametrize(
    "mk,x0,target",
    [
        (toggle_file_model, [[0, 0]], 64),
        (toggle_programmatic_model, [[0, 0]], 64),  # custom-propensity path
        (goutsias_model, [[2, 6, 0, 2, 0, 0]], 8),
    ],
)
def test_pallas_matches_xla_stencil(mk, x0, target):
    model = mk()
    box = _grown_box(model, x0, target)
    assert pallas_applicable(box)
    rng = np.random.default_rng(7)
    mask = jnp.asarray(rng.random(box.volume) < 0.6)
    x = jnp.asarray(rng.random(box.volume), jnp.float32)
    ref = make_stencil_matvec(model, box, jnp.float32)(mask, x)
    got = make_pallas_stencil_matvec(
        model, box, block_rows=16, interpret=True
    )(mask, x)
    scale = float(jnp.max(jnp.abs(ref)))
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=2e-6 * scale
    )


@pytest.mark.parametrize(
    "mk,x0,target",
    [
        (toggle_file_model, [[0, 0]], 64),
        (toggle_programmatic_model, [[0, 0]], 64),
        (goutsias_model, [[2, 6, 0, 2, 0, 0]], 8),
    ],
)
def test_pallas_v2_matches_xla_stencil(mk, x0, target):
    model = mk()
    box = _grown_box(model, x0, target)
    rng = np.random.default_rng(3)
    mask = jnp.asarray(rng.random(box.volume) < 0.6)
    x = jnp.asarray(rng.random(box.volume), jnp.float32)
    ref = make_stencil_matvec(model, box, jnp.float32)(mask, x)
    got = make_pallas_stencil_matvec_v2(
        model, box, block_rows=16, interpret=True
    )(mask, x)
    scale = float(jnp.max(jnp.abs(ref)))
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=2e-6 * scale
    )


def test_pallas_applicability_gate():
    model = toggle_file_model()
    small = BoxSpace.for_model(model.stoichiometry, [[0, 0]])
    assert not pallas_applicable(small)  # volume < 128 rows


@pytest.mark.parametrize(
    "mk,x0,target",
    [
        (toggle_file_model, [[0, 0]], 64),
        (goutsias_model, [[2, 6, 0, 2, 0, 0]], 8),
    ],
)
def test_pallas_v3_matches_xla_stencil(mk, x0, target):
    """Factor-table kernel vs the XLA stencil (same contract as v1/v2).
    Covers lane-pattern species, straddling species, and in-kernel row
    factors (the goutsias box at extent 8 has all three placements)."""
    from krylovfspssa_tpu.ops.pallas_stencil import (
        make_pallas_stencil_matvec_v3,
    )

    model = mk()
    box = _grown_box(model, x0, target)
    rng = np.random.default_rng(11)
    mask = jnp.asarray(rng.random(box.volume) < 0.6)
    x = jnp.asarray(rng.random(box.volume), jnp.float32)
    ref = make_stencil_matvec(model, box, jnp.float32)(mask, x)
    mv = make_pallas_stencil_matvec_v3(
        model, box, block_rows=64, interpret=True
    )
    assert mv is not None, "v3 should apply to separable bundled models"
    got = mv(mask, x)
    scale = float(jnp.max(jnp.abs(ref)))
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=2e-6 * scale
    )


@pytest.mark.parametrize(
    "mk,x0,target,block_rows",
    [
        (toggle_file_model, [[0, 0]], 256, 16),
        (goutsias_model, [[2, 6, 0, 2, 0, 0]], 8, 512),
    ],
)
def test_pallas_v4_matches_xla_stencil(mk, x0, target, block_rows):
    """Zero-copy kernel vs the XLA stencil.  v4's contract requires
    supp(x) ⊆ mask (the Krylov invariant), so x is pre-masked here."""
    from krylovfspssa_tpu.ops.pallas_stencil import (
        make_pallas_stencil_matvec_v4,
    )

    model = mk()
    box = _grown_box(model, x0, target)
    rng = np.random.default_rng(13)
    mask = jnp.asarray(rng.random(box.volume) < 0.6)
    x = jnp.where(mask, jnp.asarray(rng.random(box.volume), jnp.float32), 0)
    ref = make_stencil_matvec(model, box, jnp.float32)(mask, x)
    mv = make_pallas_stencil_matvec_v4(
        model, box, block_rows=block_rows, interpret=True
    )
    assert mv is not None, "v4 should apply to separable bundled models"
    got = mv(mask, x)
    scale = float(jnp.max(jnp.abs(ref)))
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=2e-6 * scale
    )


def test_pallas_v4_refuses_tall_halo():
    """A single-block geometry (halo spans the whole box) must fall back."""
    from krylovfspssa_tpu.ops.pallas_stencil import (
        make_pallas_stencil_matvec_v4,
    )

    model = goutsias_model()
    box = _grown_box(model, [[2, 6, 0, 2, 0, 0]], 8)
    assert make_pallas_stencil_matvec_v4(model, box, block_rows=4096) is None


def test_pallas_v3_custom_propensity_falls_back():
    from krylovfspssa_tpu.ops.pallas_stencil import (
        make_pallas_stencil_matvec_v3,
    )

    model = toggle_programmatic_model()
    box = _grown_box(model, [[0, 0]], 64)
    assert make_pallas_stencil_matvec_v3(model, box) is None


@pytest.mark.parametrize(
    "mk,x0,target,block_rows",
    [
        (toggle_file_model, [[0, 0]], 256, 16),
        (goutsias_model, [[2, 6, 0, 2, 0, 0]], 8, 512),
    ],
)
def test_pallas_v5_matches_xla_stencil(mk, x0, target, block_rows):
    """Streamed-diagonal deep-pattern kernel vs the XLA stencil.  Same
    supp(x) ⊆ mask contract as v4."""
    from krylovfspssa_tpu.ops.pallas_stencil import (
        make_pallas_stencil_matvec_v5,
    )

    model = mk()
    box = _grown_box(model, x0, target)
    rng = np.random.default_rng(17)
    mask = jnp.asarray(rng.random(box.volume) < 0.6)
    x = jnp.where(mask, jnp.asarray(rng.random(box.volume), jnp.float32), 0)
    ref = make_stencil_matvec(model, box, jnp.float32)(mask, x)
    mv = make_pallas_stencil_matvec_v5(
        model, box, block_rows=block_rows, interpret=True
    )
    assert mv is not None, "v5 should apply to separable bundled models"
    got = mv(mask, x)
    scale = float(jnp.max(jnp.abs(ref)))
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=2e-6 * scale
    )


def test_pallas_v5_deep_fold_selection():
    """On the flagship bench geometry the v5 pattern fold must absorb the
    second-from-top species (period 512 > the v3/v4 PCAP of 128), leaving
    exactly one row-factor species.  Build-time introspection only — the
    4.2M-cell kernel itself is exercised on TPU by bench.py and the f32
    e2e solves (interpret mode at this volume is impractical; the P<=128
    code path is numerically identical and covered above)."""
    from krylovfspssa_tpu.boxspace.box import BoxSpace
    from krylovfspssa_tpu.ops.pallas_stencil import (
        make_pallas_stencil_matvec_v5,
    )

    model = goutsias_model()
    box = BoxSpace.for_model(model.stoichiometry, [[2, 6, 0, 2, 0, 0]])
    for s, tgt in enumerate([64, 64, 16, 4, 4, 4]):
        while box.extents[s] < tgt:
            box = box.grow(s)
    mv = make_pallas_stencil_matvec_v5(model, box, interpret=True)
    assert mv is not None
    assert mv._pmax == 512  # deep fold beyond the v3/v4 PCAP=128
    row_species = {s for pat, row in mv._placements for s in row}
    assert len(row_species) == 1  # only the topmost axis stays in-kernel


def test_pallas_v5_custom_propensity_falls_back():
    from krylovfspssa_tpu.ops.pallas_stencil import (
        make_pallas_stencil_matvec_v5,
    )

    model = toggle_programmatic_model()
    box = _grown_box(model, [[0, 0]], 64)
    assert make_pallas_stencil_matvec_v5(model, box) is None


@pytest.mark.parametrize(
    "targets,block_rows",
    [
        ([16, 16, 8, 4, 4, 4], 512),
        ([16, 16, 8, 4, 4, 4], 128),  # tpb > 1 tile loop
        ([8, 8, 8, 4, 4, 4], 64),
    ],
)
def test_pallas_v6_matches_xla_stencil(targets, block_rows):
    """Scalarized-row-factor tile-loop kernel vs the XLA stencil.  Same
    supp(x) ⊆ mask contract as v4/v5."""
    from krylovfspssa_tpu.ops.pallas_stencil import (
        make_pallas_stencil_matvec_v6,
    )

    model = goutsias_model()
    box = BoxSpace.for_model(model.stoichiometry, [[2, 6, 0, 2, 0, 0]])
    for s, tgt in enumerate(targets):
        while box.extents[s] < tgt:
            box = box.grow(s)
    rng = np.random.default_rng(23)
    mask = jnp.asarray(rng.random(box.volume) < 0.6)
    x = jnp.where(mask, jnp.asarray(rng.random(box.volume), jnp.float32), 0)
    ref = make_stencil_matvec(model, box, jnp.float32)(mask, x)
    mv = make_pallas_stencil_matvec_v6(
        model, box, block_rows=block_rows, interpret=True
    )
    assert mv is not None, "v6 should apply to the Goutsias geometry"
    got = mv(mask, x)
    scale = float(jnp.max(jnp.abs(ref)))
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=2e-6 * scale
    )


def test_pallas_v6_flagship_selection():
    """On the flagship bench geometry v6 must fold the whole row-factor
    product into the per-tile scalar table: T = Pmax = 512 (the run
    length of the one row species D), no in-kernel row factors left.
    Build-time introspection only — the 4.2M-cell kernel itself runs on
    TPU via bench.py."""
    from krylovfspssa_tpu.ops.pallas_stencil import (
        make_pallas_stencil_matvec_v6,
    )

    model = goutsias_model()
    box = BoxSpace.for_model(model.stoichiometry, [[2, 6, 0, 2, 0, 0]])
    for s, tgt in enumerate([64, 64, 16, 4, 4, 4]):
        while box.extents[s] < tgt:
            box = box.grow(s)
    mv = make_pallas_stencil_matvec_v6(model, box, interpret=True)
    assert mv is not None
    assert mv._tile == 512 and mv._pmax == 512
    # v6 has no in-kernel row-factor path: every row species is
    # scalarized by construction; the 6 reactions touching D carry a
    # nontrivial per-tile scalar row
    assert sum(mv._has_scal) == 6


def test_pallas_v6_short_run_falls_back():
    """A row species whose coordinate run is shorter than the pattern
    tile cannot be scalarized — v6 must refuse (caller falls back to v5,
    which keeps the in-kernel row-factor path)."""
    from krylovfspssa_tpu.ops.pallas_stencil import (
        make_pallas_stencil_matvec_v5,
        make_pallas_stencil_matvec_v6,
    )

    model = toggle_file_model()
    box = _grown_box(model, [[0, 0]], 256)  # row species run = 2 rows
    assert make_pallas_stencil_matvec_v6(
        model, box, block_rows=16
    ) is None
    assert make_pallas_stencil_matvec_v5(
        model, box, block_rows=16, interpret=True
    ) is not None


def test_pallas_v6_custom_propensity_falls_back():
    from krylovfspssa_tpu.ops.pallas_stencil import (
        make_pallas_stencil_matvec_v6,
    )

    model = toggle_programmatic_model()
    box = _grown_box(model, [[0, 0]], 64)
    assert make_pallas_stencil_matvec_v6(model, box) is None
