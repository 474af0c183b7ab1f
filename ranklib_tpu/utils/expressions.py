"""Infix arithmetic expression evaluator
(ref: utilities/ExpressionEvaluator.java — shunting-yard to RPN, then a
stack machine; vestigial in the reference: no main CLI flow calls it, but
it is part of the utilities surface, so it exists here for completeness).

Supports: + - * /, unary minus, ^ (right-associative power), parentheses,
function calls log/ln/log2/exp/sqrt/neg, and named variables supplied at
evaluation time.

    >>> evaluate("3 + 4 * 2")
    11.0
    >>> evaluate("sqrt(x^2 + y^2)", {"x": 3, "y": 4})
    5.0
"""

from __future__ import annotations

import math
import re

from ranklib_tpu.utils.errors import RankLibError

_FUNCS = {
    "log": math.log,        # natural log, like the reference's log
    "ln": math.log,
    "log2": lambda v: math.log2(v),
    "log10": math.log10,
    "exp": math.exp,
    "sqrt": math.sqrt,
    "neg": lambda v: -v,
    "abs": abs,
}

# precedence, right-associative?
_OPS = {
    "+": (1, False), "-": (1, False),
    "*": (2, False), "/": (2, False),
    "u-": (3, True),                       # unary minus
    "^": (4, True),
}

_TOKEN = re.compile(
    r"\s*(?:(\d+\.?\d*(?:[eE][+-]?\d+)?)|([A-Za-z_][A-Za-z_0-9]*)|(.))")


def _tokenize(expr: str):
    out = []
    pos = 0
    while pos < len(expr):
        m = _TOKEN.match(expr, pos)
        if not m or m.end() == pos:
            raise RankLibError(f"Bad expression near '{expr[pos:]}'")
        num, name, sym = m.groups()
        if num is not None:
            out.append(("num", float(num)))
        elif name is not None:
            out.append(("name", name))
        elif sym.strip():
            out.append(("sym", sym))
        pos = m.end()
    return out


def to_rpn(expr: str):
    """Shunting-yard: infix → RPN token list (the reference's toPostfix)."""
    tokens = _tokenize(expr)
    out = []
    stack = []
    prev = None
    for kind, val in tokens:
        if kind == "num" or (kind == "name" and val not in _FUNCS):
            out.append((kind, val))
        elif kind == "name":                     # function
            stack.append(("func", val))
        elif val == "(":
            stack.append(("sym", "("))
        elif val == ")":
            while stack and stack[-1] != ("sym", "("):
                out.append(stack.pop())
            if not stack:
                raise RankLibError("Unbalanced ')' in expression")
            stack.pop()
            if stack and stack[-1][0] == "func":
                out.append(stack.pop())
        elif val in ("+", "-", "*", "/", "^"):
            op = val
            if op == "-" and (prev is None or prev == ("sym", "(")
                              or (prev[0] == "sym" and prev[1] in _OPS)):
                op = "u-"                        # unary minus
            p, right = _OPS[op]
            # a prefix operator has no left operand: nothing to pop for
            if op != "u-":
                while stack and stack[-1][0] == "op":
                    p2, _ = _OPS[stack[-1][1]]
                    if p2 > p or (p2 == p and not right):
                        out.append(stack.pop())
                    else:
                        break
            stack.append(("op", op))
        else:
            raise RankLibError(f"Unknown symbol '{val}' in expression")
        prev = ("sym", val) if kind == "sym" else (kind, val)
    while stack:
        top = stack.pop()
        if top == ("sym", "("):
            raise RankLibError("Unbalanced '(' in expression")
        out.append(top)
    return out


def eval_rpn(rpn, variables=None) -> float:
    try:
        return _eval_rpn(rpn, variables)
    except (ZeroDivisionError, ValueError, OverflowError) as e:
        # domain errors (1/0, sqrt(-1), log(0)) follow the module's
        # RankLibError contract like every other bad-input path
        raise RankLibError(f"Expression evaluation error: {e}") from e


def _eval_rpn(rpn, variables=None) -> float:
    variables = variables or {}
    st: list[float] = []

    def pop():
        if not st:
            raise RankLibError("Malformed expression (stack underflow)")
        return st.pop()

    for kind, val in rpn:
        if kind == "num":
            st.append(val)
        elif kind == "name":
            if val not in variables:
                raise RankLibError(f"Unbound variable '{val}'")
            st.append(float(variables[val]))
        elif kind == "func":
            st.append(_FUNCS[val](pop()))
        elif kind == "op":
            if val == "u-":
                st.append(-pop())
            else:
                b, a = pop(), pop()
                if val == "+":
                    st.append(a + b)
                elif val == "-":
                    st.append(a - b)
                elif val == "*":
                    st.append(a * b)
                elif val == "/":
                    st.append(a / b)
                elif val == "^":
                    r = a ** b
                    # negative base ** fractional exponent yields a Python
                    # complex; the reference's Math.pow returns NaN
                    st.append(float("nan") if isinstance(r, complex) else r)
    if len(st) != 1:
        raise RankLibError("Malformed expression (leftover operands)")
    return st[0]


def evaluate(expr: str, variables=None) -> float:
    """Evaluate an infix arithmetic expression (ref: ExpressionEvaluator
    getEvalResult)."""
    return eval_rpn(to_rpn(expr), variables)
