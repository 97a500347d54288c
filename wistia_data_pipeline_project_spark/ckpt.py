"""Spill-friendly lineage-truncation checkpoints for DATA-scale tables.

``DataFrame.localCheckpoint()`` materializes with Spark's default
cache level — DESERIALIZED on-heap rows (``MEMORY_AND_DISK_DESER``).
For model state (k centroid rows, a BPE vocab) that is the right
trade; for tables that scale WITH the corpus (scored near-dup pairs,
a flattened 64-column embedding table, CC label tables) the
deserialized object graph is a multiple of the on-disk size and was
the measured cause of the sf3 rehearsal's 48g heap requirement
(SCALE.md round 6: the ~60M-row kNN scored-pair checkpoint OOM'd a
16g JVM).

``spill_checkpoint`` keeps the lineage-truncation semantics but
stores SERIALIZED bytes that the unified memory manager can evict to
disk block-by-block (``MEMORY_AND_DISK``, the PySpark serialized
variant) — on a cluster the blocks spread across executor storage,
and a storage-starved executor degrades to disk reads instead of
OOM-ing. ``SPARK_GRAFT_CKPT_LEVEL=DISK_ONLY`` forces the fully
off-heap regime for rehearsals that want a hard memory ceiling.

Checkpoint STORAGE choice never changes results — only where the
materialized bytes live — so every oracle hash is invariant to it
(asserted by the sf0.01 gate after the round-7 switch).
"""

from __future__ import annotations

import os

from pyspark import StorageLevel
from pyspark.sql import DataFrame


# Storage levels a checkpoint may legitimately use. Anything else in
# the env var (a typo like "disk_only", or a non-StorageLevel attribute
# such as "__doc__") must fail at configuration time with a clear
# message, not as an opaque AttributeError deep inside an operator.
_ALLOWED_LEVELS = (
    "MEMORY_AND_DISK",
    "MEMORY_AND_DISK_2",
    "MEMORY_AND_DISK_DESER",
    "MEMORY_ONLY",
    "MEMORY_ONLY_2",
    "DISK_ONLY",
    "DISK_ONLY_2",
    "DISK_ONLY_3",
)


def spill_checkpoint(df: DataFrame, eager: bool = False) -> DataFrame:
    """``localCheckpoint`` at a serialized, disk-evictable storage
    level (env-overridable via ``SPARK_GRAFT_CKPT_LEVEL``, e.g.
    ``DISK_ONLY`` for a hard off-heap rehearsal ceiling)."""
    name = os.environ.get("SPARK_GRAFT_CKPT_LEVEL", "MEMORY_AND_DISK")
    if name not in _ALLOWED_LEVELS:
        raise ValueError(
            f"SPARK_GRAFT_CKPT_LEVEL={name!r} is not a recognized "
            f"storage level; accepted values: {', '.join(_ALLOWED_LEVELS)}"
        )
    level = getattr(StorageLevel, name)
    if not isinstance(level, StorageLevel):  # pragma: no cover - belt
        raise ValueError(
            f"StorageLevel.{name} resolved to {type(level).__name__}, "
            "not a StorageLevel"
        )
    return df.localCheckpoint(eager=eager, storageLevel=level)
