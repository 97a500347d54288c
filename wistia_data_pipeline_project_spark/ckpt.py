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


def spill_checkpoint(df: DataFrame, eager: bool = False) -> DataFrame:
    """``localCheckpoint`` at a serialized, disk-evictable storage
    level (env-overridable via ``SPARK_GRAFT_CKPT_LEVEL``, e.g.
    ``DISK_ONLY`` for a hard off-heap rehearsal ceiling)."""
    name = os.environ.get("SPARK_GRAFT_CKPT_LEVEL", "MEMORY_AND_DISK")
    level = getattr(StorageLevel, name)
    return df.localCheckpoint(eager=eager, storageLevel=level)
