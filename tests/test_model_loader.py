"""Model loader tests: .input format, reaction parsing, propensities."""

from pathlib import Path

import numpy as np
import pytest

from krylovfspssa_tpu.models.model import (
    Model,
    ModelError,
    load_model,
    parse_reaction,
)
from krylovfspssa_tpu.models.library import (
    bursting_gene_model,
    ge5d_model,
    goutsias_model,
    repressilator_model,
    toggle_programmatic_model,
)

MODELS = Path(__file__).resolve().parents[1] / "models"


def test_load_toggle():
    # reference models/toggle_model.input: 6-parameter basal toggle, the
    # model TestSolverFromFile.f90:21,31 loads and resets to [1,100,1,1,100,1]
    m = load_model(MODELS / "toggle_model.input")
    assert m.n_species == 2
    assert m.n_reactions == 4
    assert m.n_parameters == 6
    assert m.species_names == ["X", "Y"]
    assert m.parameter_names == ["bx", "kx", "dx", "by", "ky", "dy"]
    np.testing.assert_array_equal(
        m.stoichiometry, [[1, 0], [-1, 0], [0, 1], [0, -1]]
    )
    m.reset_parameters([1.0, 100.0, 1.0, 1.0, 100.0, 1.0])
    states = np.array([[0, 0], [2, 3], [10, 1]])
    props = np.asarray(m.propensities(states))
    X, Y = states[:, 0].astype(float), states[:, 1].astype(float)
    np.testing.assert_allclose(props[:, 0], 1.0 + 100.0 / (2.0 + 0.2 * Y ** 2), rtol=1e-13)
    np.testing.assert_allclose(props[:, 1], X, rtol=1e-13)
    np.testing.assert_allclose(props[:, 2], 1.0 + 100.0 / (1.0 + 0.5 * X ** 1.5), rtol=1e-13)
    np.testing.assert_allclose(props[:, 3], Y, rtol=1e-13)


def test_load_toggle_test_model():
    # reference models/toggle_test_model.input: the 4-parameter variant used
    # by the parser test (TestModelParser.f90:13-15, params [5000,1600,1,1])
    m = load_model(MODELS / "toggle_test_model.input")
    assert m.n_parameters == 4
    assert m.parameter_names == ["kx", "ky", "dx", "dy"]
    np.testing.assert_array_equal(
        m.stoichiometry, [[1, 0], [0, 1], [-1, 0], [0, -1]]
    )
    m.reset_parameters([5000.0, 1600.0, 1.0, 1.0])
    states = np.array([[0, 0], [2, 3], [10, 1]])
    props = np.asarray(m.propensities(states))
    X, Y = states[:, 0].astype(float), states[:, 1].astype(float)
    np.testing.assert_allclose(props[:, 0], 5000.0 / (1.0 + Y ** 2.5), rtol=1e-13)
    np.testing.assert_allclose(props[:, 1], 1600.0 / (1.0 + X ** 1.5), rtol=1e-13)
    np.testing.assert_allclose(props[:, 2], X, rtol=1e-13)
    np.testing.assert_allclose(props[:, 3], Y, rtol=1e-13)


def test_reset_parameters_truncates_extra_values():
    # reference parity: RESET_PARAMETERS uses only the first n_parameters
    # values when given extras (ModelModule.f90:215)
    m = load_model(MODELS / "toggle_test_model.input")
    m.reset_parameters([1.0, 100.0, 1.0, 1.0, 100.0, 1.0])
    np.testing.assert_array_equal(m.parameters, [1.0, 100.0, 1.0, 1.0])


def test_load_goutsias_dotted_names():
    m = load_model(MODELS / "goutsias_model.input")
    assert m.n_species == 6
    assert m.species_names[4] == "DNA.D"
    # reaction 'DNA + D -> DNA.D'
    np.testing.assert_array_equal(m.stoichiometry[4], [0, -1, 0, -1, 1, 0])
    # reaction '2M -> D'
    np.testing.assert_array_equal(m.stoichiometry[8], [-2, 1, 0, 0, 0, 0])
    # reaction 'RNA -> RNA + M' is net +1 M
    np.testing.assert_array_equal(m.stoichiometry[0], [1, 0, 0, 0, 0, 0])
    m.reset_parameters(np.arange(1.0, 11.0))
    st = np.array([[3, 2, 1, 1, 2, 1]])
    p = np.asarray(m.propensities(st))[0]
    # c7*DNA.D*D with c7=7: 7*2*2
    assert p[6] == pytest.approx(28.0)
    # c9*M*(M-1)/2 with c9=9: 9*3*2/2
    assert p[8] == pytest.approx(27.0)


def test_parse_reaction_forms():
    sp = ["A", "B", "AB"]
    np.testing.assert_array_equal(parse_reaction("A + B -> AB", sp), [-1, -1, 1])
    np.testing.assert_array_equal(parse_reaction("AB -> A + B", sp), [1, 1, -1])
    np.testing.assert_array_equal(parse_reaction("A + B <- AB", sp), [1, 1, -1])
    np.testing.assert_array_equal(parse_reaction("2A -> B", sp), [-2, 1, 0])
    np.testing.assert_array_equal(parse_reaction("0 -> A", sp), [1, 0, 0])
    np.testing.assert_array_equal(parse_reaction("A -> 0", sp), [-1, 0, 0])
    # catalytic: appears on both sides
    np.testing.assert_array_equal(parse_reaction("A -> A + B", sp), [0, 1, 0])
    with pytest.raises(ModelError):
        parse_reaction("A + B", sp)


def test_reference_lowercase_keywords_accepted(tmp_path):
    # the reference's loader uppercases keywords while its own model files
    # are lowercase; ours must accept any case
    f = tmp_path / "m.input"
    f.write_text(
        "NSPECIES\n1\nNREACTIONS\n1\nNPARAMETERS\n1\n"
        "Species\nA\nParameters\nk\nREACTIONS\n0 -> A\nPROPENSITIES\nk\n"
    )
    m = load_model(f)
    assert m.n_species == 1 and m.n_reactions == 1


def test_missing_propensities_is_lazy_error(tmp_path):
    f = tmp_path / "m.input"
    f.write_text(
        "nspecies\n1\nnreactions\n1\nnparameters\n1\n"
        "species\nA\nparameters\nk\nreactions\nA -> 0\n"
    )
    m = load_model(f)  # loads fine (custom propensity may be attached)
    with pytest.raises(ModelError):
        m.propensities(np.zeros((1, 1)))


def test_model_parser_driver_parity():
    # full analog of the reference parser driver test/TestModelParser.f90:
    # load MODELS/TOGGLE_TEST_MODEL.INPUT, reset to [5000,1600,1,1], and
    # compare every propensity over the 50x50 grid against the hand-coded
    # PROP function (TestModelParser.f90:80-102); then repeat with the
    # custom-propensity pointer attached (:63)
    m = load_model(MODELS / "toggle_test_model.input")
    m.reset_parameters([5000.0, 1600.0, 1.0, 1.0])
    xs, ys = np.meshgrid(np.arange(1, 51), np.arange(1, 51), indexing="ij")
    states = np.stack([xs.ravel(), ys.ravel()], axis=1)
    X, Y = states[:, 0].astype(float), states[:, 1].astype(float)
    expected = np.stack(
        [
            5000.0 / (1.0 + Y ** 2.5),
            1600.0 / (1.0 + X ** 1.5),
            1.0 * X,
            1.0 * Y,
        ],
        axis=1,
    )
    np.testing.assert_allclose(np.asarray(m.propensities(states)), expected, rtol=1e-13)

    def prop(sts, r, p):
        x, y = sts[..., 0].astype(float), sts[..., 1].astype(float)
        return [
            5000.0 / (1.0 + y ** 2.5),
            1600.0 / (1.0 + x ** 1.5),
            1.0 * x,
            1.0 * y,
        ][r]

    m.custom_propensity = prop
    np.testing.assert_allclose(np.asarray(m.propensities(states)), expected, rtol=1e-13)


def test_custom_propensity_override():
    # parity with the CUSTOMPROP pointer (TestModelParser.f90:63)
    m = load_model(MODELS / "toggle_model.input")
    m.reset_parameters([1.0, 100.0, 1.0, 1.0, 100.0, 1.0])

    def custom(states, r, p):
        return states[:, 0] * 0 + float(r + 1)

    m.custom_propensity = custom
    props = np.asarray(m.propensities(np.zeros((3, 2))))
    np.testing.assert_array_equal(props, np.tile([1, 2, 3, 4], (3, 1)))


def test_all_bundled_models_load_and_evaluate():
    for name in [
        "toggle_model",
        "toggle_test_model",
        "repressilator_model",
        "goutsias_model",
        "bursting_gene_model",
        "ge5d_model",
    ]:
        m = load_model(MODELS / f"{name}.input")
        m.reset_parameters(np.ones(m.n_parameters))
        states = np.ones((4, m.n_species), dtype=np.int32)
        props = np.asarray(m.propensities(states))
        assert props.shape == (4, m.n_reactions)
        assert np.all(np.isfinite(props))


def test_library_models_match_input_files():
    # the file-based and programmatic Goutsias models agree
    mf = load_model(MODELS / "goutsias_model.input")
    mp = goutsias_model()
    mf.reset_parameters(mp.parameters)
    states = np.array([[2, 6, 0, 2, 0, 0], [1, 1, 1, 1, 1, 1], [5, 3, 2, 1, 0, 1]])
    np.testing.assert_allclose(
        np.asarray(mf.propensities(states)),
        np.asarray(mp.propensities(states)),
        rtol=1e-13,
    )
    np.testing.assert_array_equal(mf.stoichiometry, mp.stoichiometry)


def test_ge5d_library_matches_input_file():
    mf = load_model(MODELS / "ge5d_model.input")
    mp = ge5d_model()
    mf.reset_parameters(mp.parameters)
    states = np.array(
        [[0, 0, 0, 0, 0], [1, 2, 3, 4, 5], [3, 1, 0, 2, 1], [2, 5, 5, 5, 5]]
    )
    np.testing.assert_allclose(
        np.asarray(mf.propensities(states)),
        np.asarray(mp.propensities(states)),
        rtol=1e-12,
        atol=1e-12,
    )
