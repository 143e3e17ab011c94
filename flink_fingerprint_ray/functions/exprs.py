"""Derived-column expression compiler: user formula strings → pyarrow.compute
calls inside ``map_batches``.

Reference analog: ``calculate_derived_parameters``
(``src/data_input/helpers.py:196-291``) evaluates formula strings like
``KILN_FEED_RATE = SFF + ROTO_SCALE`` in a sandboxed ``eval`` namespace with
a whitelisted math surface (``helpers.py:250-265``).  Here the formula is
parsed ONCE with ``ast`` (driver side) and compiled to a closure of
vectorized ``pyarrow.compute`` kernels — no per-batch parsing, no ``eval``.
"""

from __future__ import annotations

import ast
from collections.abc import Callable

import pyarrow as pa
import pyarrow.compute as pc

_FUNCS: dict[str, Callable] = {
    "sqrt": pc.sqrt,
    "abs": pc.abs,
    "log": pc.ln,
    "log10": pc.log10,
    "exp": pc.exp,
    "sin": pc.sin,
    "cos": pc.cos,
    "tan": pc.tan,
    "power": pc.power,
    "round": pc.round,
    "floor": pc.floor,
    "ceil": pc.ceil,
}

_BINOPS = {
    ast.Add: pc.add,
    ast.Sub: pc.subtract,
    ast.Mult: pc.multiply,
    ast.Div: pc.divide,
    ast.Pow: pc.power,
}


def compile_expr(formula: str) -> Callable[[pa.Table], pa.Array]:
    """Compile ``"sqrt(abs(value)) + log(value + 1)"`` into
    ``table -> Array`` using only whitelisted kernels.

    Column references are bare names resolved against the batch; anything
    outside the whitelist raises ``ValueError`` at compile time (the
    sandboxing contract of ``helpers.py:250-265``, enforced statically).
    """
    tree = ast.parse(formula, mode="eval")

    def build(node: ast.AST) -> Callable[[pa.Table], object]:
        if isinstance(node, ast.Expression):
            return build(node.body)
        if isinstance(node, ast.BinOp):
            op = _BINOPS.get(type(node.op))
            if op is None:
                raise ValueError(f"operator not allowed: {ast.dump(node.op)}")
            lf, rf = build(node.left), build(node.right)
            return lambda t: op(lf(t), rf(t))
        if isinstance(node, ast.UnaryOp) and isinstance(node.op, ast.USub):
            f = build(node.operand)
            return lambda t: pc.negate(f(t))
        if isinstance(node, ast.Call):
            if not isinstance(node.func, ast.Name) or node.func.id not in _FUNCS:
                raise ValueError(f"function not allowed: {ast.dump(node.func)}")
            fn = _FUNCS[node.func.id]
            args = [build(a) for a in node.args]
            return lambda t: fn(*(a(t) for a in args))
        if isinstance(node, ast.Name):
            name = node.id
            return lambda t: t[name].combine_chunks() if isinstance(t, pa.Table) else t[name]
        if isinstance(node, ast.Constant) and isinstance(node.value, (int, float)):
            v = node.value
            return lambda t: v
        raise ValueError(f"expression node not allowed: {ast.dump(node)}")

    fn = build(tree)
    return lambda table: fn(table)


def add_derived_columns(batch: pa.Table, formulas: dict[str, str]) -> pa.Table:
    """Append one column per ``{name: formula}`` (compiled per call site —
    wrap in a class for actor pools to compile once)."""
    for name, formula in formulas.items():
        arr = compile_expr(formula)(batch)
        if not isinstance(arr, (pa.Array, pa.ChunkedArray)):
            arr = pa.array([arr] * batch.num_rows)
        batch = batch.append_column(name, arr)
    return batch


class DerivedColumnStage:
    """Actor-pool form: formulas compiled once per actor in __init__."""

    def __init__(self, formulas: dict[str, str]) -> None:
        self.compiled = {n: compile_expr(f) for n, f in formulas.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        for name, fn in self.compiled.items():
            arr = fn(batch)
            if not isinstance(arr, (pa.Array, pa.ChunkedArray)):
                arr = pa.array([arr] * batch.num_rows)
            batch = batch.append_column(name, arr)
        return batch
