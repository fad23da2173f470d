"""CDC merge: apply an upsert/delete batch to a base snapshot.

Parquet has no in-place MERGE; the scalable pattern (what Delta/Iceberg
copy-on-write does under the hood) is a key-wise reconciliation producing
the next snapshot: rows of the base whose key is untouched survive, upserts
replace, deletes drop. Expressed as anti-join + union, both shuffling only
on the merge key — at 100 TB the base side is the big one and stays
hash-partitioned; pair with ``sources.layout.write_partitioned`` to emit
the snapshot and the whole merge is two narrow shuffles end to end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["upsert_snapshot"]


def upsert_snapshot(
    base: DataFrame,
    changes: DataFrame,
    keys: list[str],
    delete_col: str | None = None,
) -> DataFrame:
    """Next snapshot after applying ``changes`` to ``base``.

    ``changes`` rows win over same-key base rows (SCD type 1). If
    ``delete_col`` names a boolean column, rows with it true are tombstones:
    they remove the base row and contribute nothing. ``changes`` must be
    key-unique (one change per key per batch — the CDC compaction contract;
    enforce upstream with ``dropDuplicates(keys)`` on the latest offset).
    """
    survivors = base.join(changes.select(*keys), keys, "left_anti")
    if delete_col is not None:
        changes = changes.filter(~F.col(delete_col)).drop(delete_col)
    return survivors.unionByName(changes)
