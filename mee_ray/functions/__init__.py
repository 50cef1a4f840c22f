"""Scalar-function surface (reference: modules/handlers/common.py).

The reference exposes a mini-DSL over ``db_field`` strings — nested
calls like ``max(min(a, b), abs(c))`` parsed by a paren/quote-aware
splitter, dispatched by name with a dotted-import fallback
(common.py:32-127) and evaluated one row at a time.  Here the same
expression language compiles once to a **vectorized** evaluator over a
``pyarrow.Table`` batch — per-batch Arrow kernels, no per-row Python.
"""

from mee_ray.functions.scalar import (  # noqa: F401
    compile_expr,
    eval_expr,
    register,
    registered,
)
