"""Expression evaluator (ref: utilities/ExpressionEvaluator.java —
vestigial in the reference but part of the utilities surface)."""

import math

import pytest

from ranklib_tpu.utils.errors import RankLibError
from ranklib_tpu.utils.expressions import evaluate


@pytest.mark.parametrize("expr,want", [
    ("3 + 4 * 2", 11.0),
    ("(3 + 4) * 2", 14.0),
    ("2 ^ 3 ^ 2", 512.0),            # right-associative power
    ("-3 + 5", 2.0),
    ("2 * -3", -6.0),
    ("10 / 4", 2.5),
    ("1e2 + 0.5", 100.5),
    ("sqrt(16)", 4.0),
    ("log(exp(2))", 2.0),
    ("log2(8)", 3.0),
    ("abs(-7)", 7.0),
    ("neg(3) + 3", 0.0),
])
def test_arithmetic(expr, want):
    assert evaluate(expr) == pytest.approx(want)


def test_variables():
    assert evaluate("sqrt(x^2 + y^2)", {"x": 3, "y": 4}) == pytest.approx(5.0)
    assert evaluate("a*b - c", {"a": 2, "b": 5, "c": 1}) == pytest.approx(9.0)


@pytest.mark.parametrize("expr", [
    "3 +", "(1 + 2", "1 + 2)", "foo(3)", "x + 1", "1 ? 2",
])
def test_errors(expr):
    with pytest.raises(RankLibError):
        evaluate(expr)


def test_nested_functions():
    assert evaluate("log(exp(sqrt(4)))") == pytest.approx(2.0)
    assert evaluate("2 ^ -1") == pytest.approx(0.5)


@pytest.mark.parametrize("expr", ["1/0", "sqrt(0-4)", "log(0-1)"])
def test_domain_errors_wrapped(expr):
    with pytest.raises(RankLibError):
        evaluate(expr)
