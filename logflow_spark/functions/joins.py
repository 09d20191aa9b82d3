"""Join-shape helpers.

``broadcast_singleton_join`` attaches a tiny (usually 1-row) frame to every
row of a big frame as a **BroadcastHashJoin**, never a
BroadcastNestedLoopJoin/CartesianProduct. A naive ``crossJoin(broadcast(s))``
— or an equi-join on two ``lit(1)`` keys, which Catalyst constant-folds back
into a cross join — compiles to BNLJ, and the repo's plan sweep
(tests/test_plan_properties.py) rejects any servable query containing one.

The trick is a join key that is constant *in value* but **non-foldable**:
``pmod(hash(col), 1)`` references a real attribute, so FoldablePropagation
cannot reduce the join condition to ``true`` (and no arithmetic
simplification rule rewrites pmod-by-one — unlike ``* 0``, which Catalyst
eliminates). ``hash`` never returns null (nulls hash to the seed), so the
key is exactly 0 on every row of both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_KEY = "_singleton_k"


def _zero_key(df: DataFrame):
    return F.pmod(F.hash(F.col(df.columns[0])), F.lit(1))


def broadcast_singleton_join(big: DataFrame, single: DataFrame) -> DataFrame:
    """big ⋈ broadcast(single) on a non-foldable constant key → BHJ.

    Every row of ``big`` pairs with every row of ``single``; ``single`` must
    be tiny (a scalar aggregate, a small query set). ``big`` keeps its
    partitioning — no shuffle on the big side.
    """
    overlap = set(big.columns) & set(single.columns)
    assert not overlap, (
        f"broadcast_singleton_join: overlapping columns {sorted(overlap)} "
        "would be ambiguous downstream — rename one side first"
    )
    clash = {c for c in (*big.columns, *single.columns) if c == _KEY}
    assert not clash, (
        f"broadcast_singleton_join: input already has a '{_KEY}' column — "
        "withColumn would overwrite it and drop() would remove the user's "
        "column from the output; rename it first"
    )
    b = big.withColumn(_KEY, _zero_key(big))
    s = single.withColumn(_KEY, _zero_key(single))
    return b.join(F.broadcast(s), _KEY).drop(_KEY)
