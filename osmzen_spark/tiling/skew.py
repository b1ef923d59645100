"""Explicit skew handling for dense-tile joins (north-rule item:
"skew from dense metro tiles is handled with salted repartitioning and
AQE skew-join splitting").

AQE skew-join splitting (on engine-wide, session.py) repairs skew
AFTER a sort-merge shuffle materializes oversized partitions. Salting
prevents the oversized partition from ever existing — the right tool
when one tile holds a constant fraction of the table (a metro z10
tile over Manhattan at 10^12 rows), because a single shuffle partition
can exceed executor memory before AQE gets to split it, and because
AQE cannot split the partition of a hash AGGREGATION, only joins.

``salted_join``: the skewed (big) side gains a deterministic salt in
[0, n_salt) hashed from a high-cardinality entropy column; the small
side replicates n_salt x via one explode (at 10^12 scale the small
side is the per-tile dimension — thousands of rows, so replication is
KBs); the equi-join keys become (key..., salt), spreading each hot key
over n_salt shuffle partitions. Result rows are identical to the
unsalted join (asserted in tests/test_tiling.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    entropy: str,
    n_salt: int = 8,
    how: str = "inner",
    broadcast_small: bool = False,
) -> DataFrame:
    """Join ``big`` (skewed on ``on``) with ``small``, spreading each
    join key over ``n_salt`` shuffle partitions. ``entropy`` names a
    high-cardinality big-side column (an id) hashed into the salt —
    deterministic, so lineage recomputation after executor loss
    reproduces identical partitioning.

    The small side is hinted shuffle_hash by default: a broadcastable
    dim needs no salting at all (a broadcast join shuffles nothing, so
    there is no partition to skew) — salting exists precisely for the
    dim that is too big to broadcast, and at sandbox data sizes the
    hint keeps the demo plan in the regime the operator targets.
    Pass broadcast_small=True to let the optimizer pick (the salt then
    costs one int column and is harmless)."""
    if how.replace("_", "").lower() in ("right", "rightouter", "full", "fullouter", "outer"):
        # each small-side key exists n_salt times, so outer semantics
        # preserving the SMALL side would emit spurious null-extended
        # rows for every salt replica no big row hashed to
        raise ValueError(f"salted_join is only correct for big-side-preserving joins, not {how!r}")
    b = big.withColumn(SALT, F.pmod(F.xxhash64(F.col(entropy)), F.lit(n_salt)).cast("int"))
    s = small.withColumn(SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1))))
    if not broadcast_small:
        s = s.hint("shuffle_hash")
    return b.join(s, on=[*on, SALT], how=how).drop(SALT)
