"""bind_once — evaluate an expensive expression once per row.

Catalyst's project collapse substitutes aliases into every consuming
expression, and a higher-order-function lambda re-evaluates any
non-lambda subexpression it references PER ELEMENT. Either way, an
expensive subtree (a regex tokenizer, say) referenced k times — or
inside a transform over n elements — runs k (or n) times per row.
Measured on this repo's minhash shingles at sf0.1: 3s -> 28s when the
tokenizer pattern got heavier, because `words` was re-evaluated per
shingle.

The fix is a single-element-array transform: `transform(array(col),
x -> fn(x))[1]` binds `col` to a lambda variable, which IS evaluated
once and referenced cheaply thereafter.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def bind_once(col: Column, fn: Callable[[Column], Column]) -> Column:
    """Evaluate `col` once per row, pass it to `fn` as a bound lambda
    variable, return fn's result."""
    return F.element_at(F.transform(F.array(col), fn), 1)
