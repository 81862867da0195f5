"""Expression compiler tests.

Mirrors the reference parser test semantics (test/TestModelParser.f90:33-45):
parsed propensities must agree with hand-coded functions over a state grid.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from krylovfspssa_tpu.models.expressions import (
    ExpressionError,
    compile_expression,
    parse_expression,
)


def ev(expr, variables, **env):
    fn = compile_expression(expr, variables)
    env = {k: jnp.asarray(v, dtype=jnp.float64) for k, v in env.items()}
    return np.asarray(fn(env))


def test_basic_arithmetic():
    assert ev("1 + 2*3", []) == 7.0
    assert ev("(1 + 2)*3", []) == 9.0
    assert ev("2^3^2", []) == 512.0  # right-associative
    assert ev("10/4", []) == 2.5
    assert ev("-2^2", []) == -4.0  # Fortran: -(2**2)


def test_fortran_literals():
    assert ev("2.0d0", []) == 2.0
    assert ev("1.5D-3", []) == 1.5e-3
    assert ev("2.72e2", []) == 272.0
    assert ev("0.8765d0*1.0D-11", []) == pytest.approx(0.8765e-11)


def test_double_star_power():
    assert ev("S1**(2.5d0)", ["S1"], S1=4.0) == pytest.approx(32.0)


def test_variables_and_functions():
    out = ev("kx/(1.0 + Y^2.5)", ["Y", "kx"], Y=2.0, kx=10.0)
    assert out == pytest.approx(10.0 / (1.0 + 2.0 ** 2.5))
    assert ev("sqrt(abs(-9))", []) == 3.0
    assert ev("exp(0) + log(1)", []) == 1.0
    assert ev("LOG10(100)", []) == pytest.approx(2.0)


def test_dotted_species_names():
    vs = ["D", "DNA", "DNA.D", "DNA.2D", "c7"]
    out = ev("c7*DNA.D*D", vs, **{"DNA.D": 3.0, "D": 2.0, "c7": 0.5})
    assert out == pytest.approx(3.0)
    out = ev("DNA.2D + DNA", vs, **{"DNA.2D": 5.0, "DNA": 1.0})
    assert out == pytest.approx(6.0)


def test_batched_eval():
    y = np.arange(5, dtype=np.float64)
    out = ev("ky/(1.0 + X^1.5)", ["X", "ky"], X=y, ky=100.0)
    ref = 100.0 / (1.0 + y ** 1.5)
    np.testing.assert_allclose(out, ref, rtol=1e-13)


def test_toggle_grid_vs_handwritten():
    """Parity analog of TestModelParser (test/TestModelParser.f90:33-45):
    parsed propensities of the toggle_test model vs the hand-coded PROP
    function over a 50x50 grid, exact to fp tolerance."""
    variables = ["X", "Y", "kx", "ky", "dx", "dy"]
    xs, ys = np.meshgrid(np.arange(1, 51), np.arange(1, 51), indexing="ij")
    X = xs.ravel().astype(np.float64)
    Y = ys.ravel().astype(np.float64)
    env = dict(X=X, Y=Y, kx=5000.0, ky=1600.0, dx=1.0, dy=1.0)

    got = ev("kx/(1.0 + Y^2.5)", variables, **env)
    np.testing.assert_allclose(got, 5000.0 / (1.0 + Y ** 2.5), rtol=1e-13)
    got = ev("ky/(1.0 + X^1.5)", variables, **env)
    np.testing.assert_allclose(got, 1600.0 / (1.0 + X ** 1.5), rtol=1e-13)
    got = ev("dx*X", variables, **env)
    np.testing.assert_allclose(got, X, rtol=1e-13)


def test_unary_minus_and_spaces():
    assert ev("- 3 + 5", []) == 2.0
    assert ev("2 * -3", []) == -6.0


def test_integer_power_at_zero():
    # x^2 at x=0 must be exactly 0 (propensities at boundary states)
    assert ev("X^2", ["X"], X=0.0) == 0.0
    assert ev("c*M*(M-1)/2.0d0", ["M", "c"], M=0.0, c=1.0) == 0.0


def test_syntax_errors():
    with pytest.raises(ExpressionError):
        parse_expression("1 +", [])
    with pytest.raises(ExpressionError):
        parse_expression("foo(2)", [])
    with pytest.raises(ExpressionError):
        parse_expression("(1+2", [])
    with pytest.raises(ExpressionError):
        parse_expression("unknownvar + 1", ["X"])
