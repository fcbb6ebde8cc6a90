from pyspark.sql import Column
from pyspark.sql import functions as F


def bind_once(col: Column, fn) -> Column:
    """Evaluate ``col`` once per row and pass the result to ``fn`` as a
    bound lambda variable (via a 1-element array transform).

    Catalyst inlines plain column expressions into each invocation of a
    higher-order-function lambda — a non-trivial subexpression (regexp,
    split, per-token hashing) referenced inside ``transform(sequence(...))``
    is otherwise recomputed PER ELEMENT, turning linear map logic
    quadratic. Lambda variables, by construction, are evaluated exactly
    once per binding.
    """
    return F.transform(F.array(col), fn).getItem(0)
