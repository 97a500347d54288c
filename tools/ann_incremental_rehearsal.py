"""O(batch) evidence for incremental ANN index maintenance
(VERDICT r09 next-round 4, SCALE.md round 10).

For each corpus size, build the persisted ``ivf_cell_stats`` state
once (billed separately — in production it already exists), then
time ``ivf_incremental_update`` for a FIXED-size ingest batch. The
update's cost must be independent of the corpus behind the state:
assignment is O(|batch| x cells) broadcast work, the merge touches
|cells| x dim state rows, and the existing corpus is never re-read.

Usage: python tools/ann_incremental_rehearsal.py [corpus_dir ...]
(default: /tmp/sf1 /tmp/sf10; batch = 20k vectors from /tmp/sf1)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> int:
    dirs = sys.argv[1:] or ["/tmp/sf1", "/tmp/sf10"]
    from wistia_data_pipeline_project_spark.ckpt import spill_checkpoint
    from wistia_data_pipeline_project_spark.operators import similarity as S
    from wistia_data_pipeline_project_spark.session import get_spark
    from wistia_data_pipeline_project_spark.sources.io import load_table

    spark = get_spark(app_name="ann-incremental-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")

    # fixed ingest batch: the first 20k vectors of the SMALLEST corpus,
    # ids offset out of every corpus's range
    batch = (
        load_table(spark, dirs[0], "embeddings")
        .filter(F.col("vec_id") < 20000)
        .select((F.col("vec_id") + 10**9).alias("vec_id"), "embedding")
    )
    batch = spill_checkpoint(batch, eager=True)
    n_batch = batch.count()

    for d in dirs:
        emb = load_table(spark, d, "embeddings")
        cents = emb.filter(F.col("vec_id") < 8).select(
            F.col("vec_id").cast("integer").alias("centroid_id"),
            F.col("embedding").alias("cv"),
        )
        n_corpus = emb.count()
        t0 = time.monotonic()
        stats = spill_checkpoint(S.ivf_cell_stats(emb, cents), eager=True)
        t_state = time.monotonic() - t0
        for rep in range(2):
            t0 = time.monotonic()
            out = S.ivf_incremental_update(stats, batch, cents)
            n_cells = out.count()
            t_upd = time.monotonic() - t0
            print(
                f"{d}: corpus={n_corpus} batch={n_batch} "
                f"state_build={t_state:.1f}s update_rep{rep}={t_upd:.2f}s "
                f"cells={n_cells}"
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
