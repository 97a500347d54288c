"""Multimodal columns (north_star): image/audio/video as opaque
``binary`` payloads with typed metadata, plus decode / feature-extract
/ resize / frame-sample implemented as Arrow-batched ``mapInPandas``
transforms.

The reference stores media *descriptions* (thumbnail/asset URL structs,
``/root/reference/cloud-run-job/media_stats_schema.json:75-109``) and
never touches pixel data; this module supplies the pixel-level operator
surface a training-data pipeline needs on top of that shape.

Codec boundary: this container has no image/audio libraries, so
``decode_payload`` tries Pillow and falls back to a **deterministic
fake raster** (documented below) — the Spark-side contract (schemas,
Arrow batch shapes, partitioning) is identical either way, and every
transform downstream of decode is real NumPy.

Scale design (100 TB of media):
- payloads stay opaque bytes end-to-end; nothing shuffles decoded
  pixels. Decode happens inside ``mapInPandas`` per input split and
  its outputs are small typed columns (features, dims, sampled-frame
  summaries), so shuffle volume is metadata-sized.
- ``spark.sql.execution.arrow.maxRecordsPerBatch`` caps batch memory:
  with ~1 MB payloads the default 10k-row batch would hold ~10 GB —
  callers set it to O(64) for real media. (Tested: the transforms
  respect whatever batch size Arrow hands them.)
- feature extraction is embarrassingly parallel — no skew risk keyed
  on content; partition count follows the input splits.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from wistia_data_pipeline_project_spark.ckpt import spill_checkpoint

try:  # codec boundary: absent in this container, real in production
    from PIL import Image  # type: ignore  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False

# typed metadata carried alongside every payload
ASSET_META = T.StructType(
    [
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),  # audio only
        T.StructField("n_frames", T.IntegerType()),  # video only
    ]
)

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", ASSET_META),
    ]
)

IMAGE_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("mean_pixel", T.DoubleType()),
        T.StructField("std_pixel", T.DoubleType()),
        T.StructField("histogram", T.ArrayType(T.LongType())),
    ]
)

RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("mean_pixel", T.DoubleType()),
    ]
)

AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("zero_crossings", T.LongType()),
    ]
)


def attach_fake_assets(df: DataFrame, key_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Derive a deterministic multimodal asset table from a text table
    (test/demo source: the container ships no media files).

    payload = utf-8 bytes of the text; media_type cycles by key;
    declared dims derive from the key. Deterministic in BOTH engines —
    the DuckDB oracle rebuilds the same table with encode()/octet_length.
    """
    k = F.col(key_col)
    mt = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (k % 3 + 1).cast("int"),
    )
    return df.select(
        k.alias("asset_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            mt.alias("media_type"),
            F.lit("fake").alias("format"),
            (k % 32 + 8).cast("int").alias("width"),
            (k % 24 + 8).cast("int").alias("height"),
            F.lit(3).cast("int").alias("n_channels"),
            F.when(mt == "audio", F.lit(16000)).cast("int").alias("sample_rate"),
            F.when(mt == "video", (k % 10 + 2)).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def attach_fake_thumbnails(
    df: DataFrame, key_col: str = "doc_id", text_col: str = "text",
    width: int = 16, height: int = 12,
) -> DataFrame:
    """Uniform-geometry image-asset table (every row a width×height
    thumbnail whose raster tiles the text bytes). The fixed geometry
    mirrors a real thumbnail pipeline — and makes near-dup TEXTS yield
    near-dup RASTERS, so perceptual-hash pairing has signal to find
    (under ``attach_fake_assets``'s key-derived geometry, near-dup
    payloads get different dims and can never pair)."""
    return df.select(
        F.col(key_col).alias("asset_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            F.lit("image").alias("media_type"),
            F.lit("fake").alias("format"),
            F.lit(width).cast("int").alias("width"),
            F.lit(height).cast("int").alias("height"),
            F.lit(3).cast("int").alias("n_channels"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def fake_decode(payload: bytes, width: int, height: int, n_channels: int = 3) -> np.ndarray:
    """Deterministic fake raster: payload bytes tiled into (h, w, c)
    uint8. Stands in for a codec; same contract (HWC uint8 array)."""
    size = height * width * n_channels
    buf = np.frombuffer(payload or b"\0", dtype=np.uint8)
    reps = -(-size // max(len(buf), 1))  # ceil-div
    return np.tile(buf, reps)[:size].reshape(height, width, n_channels)


def fake_decode_audio(payload: bytes) -> np.ndarray:
    """Deterministic fake PCM decode: payload bytes as little-endian
    int16 samples (odd trailing byte dropped). Stands in for an audio
    codec; same contract (1-D int16 waveform)."""
    buf = payload or b""
    return np.frombuffer(buf[: len(buf) // 2 * 2], dtype="<i2")


def decode_payload(payload: bytes, meta: dict) -> np.ndarray:
    """Codec entry point. Pillow when available; deterministic fake
    raster otherwise. Raises for modalities with no decoder."""
    if meta.get("media_type") == "audio":
        return fake_decode_audio(payload)
    if meta.get("media_type") not in ("image", "video"):
        raise NotImplementedError(
            f"no decoder for media_type={meta.get('media_type')!r} in this build"
        )
    if HAVE_PIL and meta.get("format") != "fake":
        import io

        arr = np.asarray(Image.open(io.BytesIO(payload)))
        # grayscale/palette decodes are 2-D; normalize to HWC so every
        # consumer can index shape[2]
        return arr[:, :, None] if arr.ndim == 2 else arr
    return fake_decode(
        payload, int(meta["width"]), int(meta["height"]), int(meta.get("n_channels") or 3)
    )


def _nearest_resize(arr: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize, pure NumPy (index gather, no codec)."""
    h, w = arr.shape[:2]
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return arr[ys][:, xs]


def image_features(assets: DataFrame, n_bins: int = 8) -> DataFrame:
    """Per-image statistics via Arrow-batched decode.

    Output is metadata-sized (stats + an ``n_bins`` histogram), so the
    binary column never leaves the scan stage — and only IMAGE rows
    reach Arrow at all: the media_type filter runs Spark-side, so
    audio/video payloads (2/3 of a mixed table) are pruned at the scan
    instead of being serialized to Python just to be skipped.
    """
    if 256 % n_bins:
        raise ValueError(f"n_bins must divide 256, got {n_bins}")
    shift = (256 // n_bins).bit_length() - 1

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            # zip over the batch columns: iterrows() builds a
            # Series per row and was the Python-side bottleneck
            for asset_id, payload, meta in zip(
                pdf["asset_id"], pdf["payload"], pdf["meta"]
            ):
                if meta["media_type"] != "image":
                    continue
                arr = decode_payload(payload, meta)
                hist = np.bincount(arr.ravel() >> shift, minlength=n_bins)[:n_bins]
                # canonical moment formula over EXACT integer sums
                # (pixel sums fit in int64), evaluated with the same
                # IEEE expression the SQL oracle uses — bit-identical
                # cross-engine, unlike np.std's mean-of-deviations
                flat = arr.astype(np.int64).ravel()
                n = flat.size
                s = int(flat.sum())
                sq = int((flat * flat).sum())
                mean = s / n
                # math.sqrt is correctly rounded; ** 0.5 is pow() and
                # can differ from SQL sqrt by an ulp
                std = math.sqrt(max(sq / n - mean * mean, 0.0))
                rows.append(
                    {
                        "asset_id": asset_id,
                        "n_bytes": len(payload or b""),
                        "width": arr.shape[1],
                        "height": arr.shape[0],
                        "n_channels": arr.shape[2],
                        "mean_pixel": mean,
                        "std_pixel": std,
                        "histogram": hist.tolist(),
                    }
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in IMAGE_FEATURE_SCHEMA.fields]
            )

    return assets.filter(F.col("meta.media_type") == "image").mapInPandas(
        extract, IMAGE_FEATURE_SCHEMA
    )


def resize_images(assets: DataFrame, out_w: int = 8, out_h: int = 8) -> DataFrame:
    """Decode → nearest-neighbor resize → re-encode (raw HWC bytes).

    The one multimodal operator whose output IS pixels; emits fixed
    ``out_w × out_h × c`` payloads, so output size is bounded per row
    regardless of input size.
    """

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for asset_id, payload, meta in zip(
                pdf["asset_id"], pdf["payload"], pdf["meta"]
            ):
                if meta["media_type"] != "image":
                    continue
                arr = decode_payload(payload, meta)
                out = _nearest_resize(arr, out_w, out_h)
                rows.append(
                    {
                        "asset_id": asset_id,
                        "width": out_w,
                        "height": out_h,
                        "payload": out.tobytes(),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in RESIZED_SCHEMA.fields])

    return assets.filter(F.col("meta.media_type") == "image").mapInPandas(
        work, RESIZED_SCHEMA
    )


def audio_features(assets: DataFrame) -> DataFrame:
    """Per-clip waveform statistics (duration, RMS, zero crossings)
    via the fake PCM decode — metadata-sized output, same Arrow-batch
    plumbing as the image path."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for asset_id, payload, meta in zip(
                pdf["asset_id"], pdf["payload"], pdf["meta"]
            ):
                if meta["media_type"] != "audio":
                    continue
                wave = decode_payload(payload, meta).astype(np.float64)
                sr = int(meta["sample_rate"] or 16000)
                n = len(wave)
                rows.append(
                    {
                        "asset_id": asset_id,
                        "n_samples": n,
                        "duration_s": n / sr,
                        "rms": float(np.sqrt(np.mean(wave**2))) if n else 0.0,
                        "zero_crossings": int(np.sum(np.diff(np.signbit(wave)))) if n else 0,
                    }
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_FEATURE_SCHEMA.fields]
            )

    return assets.filter(F.col("meta.media_type") == "audio").mapInPandas(
        extract, AUDIO_FEATURE_SCHEMA
    )


def sample_frames(assets: DataFrame, every_k: int = 2) -> DataFrame:
    """Frame sampling for video payloads: decode the fake frame stack
    (n_frames × h × w × c from the same byte-tiling codec), keep every
    k-th frame, emit per-frame summaries (one output row per kept
    frame — a mapInPandas that *generates* rows)."""

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for asset_id, payload, meta in zip(
                pdf["asset_id"], pdf["payload"], pdf["meta"]
            ):
                if meta["media_type"] != "video" or not meta["n_frames"]:
                    continue
                w, h, c = int(meta["width"]), int(meta["height"]), int(meta["n_channels"] or 3)
                n = int(meta["n_frames"])
                stack = fake_decode(payload, w, h * n, c).reshape(n, h, w, c)
                for i in range(0, n, every_k):
                    rows.append(
                        {
                            "asset_id": asset_id,
                            "frame_idx": i,
                            "mean_pixel": float(stack[i].mean()),
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SCHEMA.fields])

    return assets.filter(F.col("meta.media_type") == "video").mapInPandas(
        work, FRAME_SCHEMA
    )


AHASH_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("ahash", T.LongType()),
    ]
)


def average_hash(assets: DataFrame, hash_w: int = 8, hash_h: int = 8) -> DataFrame:
    """Perceptual average-hash per image (the classic aHash): decode →
    nearest-resize to hash_w×hash_h → grayscale (channel sum) →
    threshold each cell at the grid mean → pack row-major into a
    64-bit code. Near-identical images (small crops/noise) land within
    a few Hamming bits — the image-side analogue of SimHash for text.

    The threshold is computed in EXACT integer arithmetic
    (``n_cells * cell_sum > total_sum`` over the raw channel sums, an
    equivalent rewrite of "cell mean above grid mean") so the bit
    pattern is engine-neutral — a SQL oracle replays it with integer
    comparisons, with no IEEE summation-order ambiguity at ties.

    Output is 16 bytes per image; payloads never shuffle. Same
    Arrow-batch + Spark-side media_type pruning as image_features.
    """
    if hash_w * hash_h != 64:
        raise ValueError("hash grid must pack exactly 64 bits")

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for asset_id, payload, meta in zip(
                pdf["asset_id"], pdf["payload"], pdf["meta"]
            ):
                if meta["media_type"] != "image":
                    continue
                arr = decode_payload(payload, meta)
                small = _nearest_resize(arr, hash_w, hash_h)
                cell = small.astype(np.int64).sum(axis=2)
                bits = (cell.size * cell > cell.sum()).ravel()
                code = 0
                for i, b in enumerate(bits):
                    if b:
                        code |= 1 << i
                # map into signed 64-bit (bit 63 set -> negative long)
                if code >= 1 << 63:
                    code -= 1 << 64
                rows.append({"asset_id": asset_id, "ahash": code})
            yield pd.DataFrame(rows, columns=["asset_id", "ahash"])

    return assets.filter(F.col("meta.media_type") == "image").mapInPandas(
        extract, AHASH_SCHEMA
    )


def image_near_dup_pairs(
    assets: DataFrame, max_hamming: int = 4
) -> DataFrame:
    """Image near-dup pairs by aHash Hamming distance ≤ ``max_hamming``
    via pigeonhole blocking (same scheme as the SimHash text path:
    split the 64-bit code into 4×16-bit blocks — any pair within
    Hamming 3 shares a block; at max_hamming 4 use it as a
    high-recall candidate stage).

    Scale: candidates come from an equi-join on (block_idx, block
    value) — Σ buckets |bucket|², never all-pairs; the exact Hamming
    verify is two codegen'd ops per candidate.
    """
    # checkpoint the codes: the hash table feeds BOTH sides of the
    # self-join, and an un-checkpointed plan would inline the Python
    # decode+hash pass into each side — the corpus would be decoded
    # twice (the trap dedup.bucket_pairs documents). 16 bytes/image;
    # lazy (eager=False) so building/explaining the plan doesn't run
    # the decode job — it materializes on the first action; serialized
    # spill-friendly storage since the table scales with the corpus.
    codes = spill_checkpoint(average_hash(assets))
    return _ahash_block_pairs(codes, max_hamming)


def _ahash_block_pairs(
    codes: DataFrame, max_hamming: int, n_blocks: int = 4
) -> DataFrame:
    """Pigeonhole block join over an (asset_id, ahash) code table —
    shared by the raw pair entry and the dedup cascade (which runs it
    over exact-hash REPRESENTATIVES).

    Completeness: splitting 64 bits into ``n_blocks`` lanes guarantees
    every pair within Hamming ``n_blocks - 1`` shares a lane; at
    ``max_hamming >= n_blocks`` the join is a high-RECALL candidate
    stage, not an exact pair set (a pair can spread one differing bit
    into every lane). Callers that need the exact set must pass
    ``n_blocks >= max_hamming + 1``.
    """
    if not 2 <= n_blocks <= 32:
        raise ValueError(f"n_blocks must be in [2, 32], got {n_blocks}")
    # nearly-equal bit lanes covering all 64 bits (first `rem` lanes
    # one bit wider); widths <= 32 so every mask fits a signed long
    base_w, rem = divmod(64, n_blocks)
    lanes = []
    offset = 0
    for i in range(n_blocks):
        w = base_w + (1 if i < rem else 0)
        lanes.append((i, offset, w))
        offset += w
    blocks = codes.select(
        "asset_id",
        "ahash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("block_idx"),
                        F.shiftright(F.col("ahash"), off)
                        .bitwiseAND(F.lit((1 << w) - 1))
                        .alias("block_val"),
                    )
                    for i, off, w in lanes
                ]
            )
        ).alias("b"),
    ).select("asset_id", "ahash", "b.block_idx", "b.block_val")
    a, b = blocks.alias("a"), blocks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.block_idx") == F.col("b.block_idx"))
            & (F.col("a.block_val") == F.col("b.block_val"))
            & (F.col("a.asset_id") < F.col("b.asset_id")),
        )
        .select(
            F.col("a.asset_id").alias("asset_a"),
            F.col("b.asset_id").alias("asset_b"),
            F.col("a.ahash").alias("_ha"),
            F.col("b.ahash").alias("_hb"),
        )
        .dropDuplicates(["asset_a", "asset_b"])
    )
    return cand.select(
        "asset_a",
        "asset_b",
        F.bit_count(F.col("_ha").bitwiseXOR(F.col("_hb"))).alias("hamming"),
    ).filter(F.col("hamming") <= max_hamming)


def image_dedup_cascade(
    assets: DataFrame, max_hamming: int = 3
) -> DataFrame:
    """Exact-then-near image dedup cascade: collapse EXACT aHash
    duplicates to one representative per code (min asset_id), then
    run the pigeonhole near-dup join over REPRESENTATIVES only.

    Unlike the raw pair entry (a documented high-recall candidate
    stage at hamming 4 with fixed 4 lanes), the cascade's pair set is
    EXACT for any ``max_hamming``: the lane count is derived as
    ``max_hamming + 1`` so the pigeonhole guarantee always holds —
    a pair within the radius cannot spread one differing bit into
    every lane. Representatives are distinct codes, so lane-bucket
    population (and thus candidate volume) is bounded by the code
    space, not duplicate-group size.

    This is the production answer to mega-duplicate groups — the
    round-7 sf10 rehearsal measured the raw pair entry emitting
    C(g,2) pairs per g-sized identical-image group (20.2M pairs at
    100x, 17x the 3.3x data growth): a viral image duplicated 10^6
    times would emit 5*10^11 raw pairs, while the cascade emits ONE
    representative whose ``group_size`` carries the multiplicity.
    Representative pairs have distinct codes, so ``hamming >= 1`` by
    construction; ``n_cross_pairs = size_a * size_b`` is the raw pair
    count each representative edge stands for.

    Scale: the collapse is one map-combinable aggregate on the
    16-byte code; the block join's bucket population is bounded by
    DISTINCT codes per lane value, immune to duplicate-group size.
    """
    codes = spill_checkpoint(average_hash(assets))
    groups = codes.groupBy("ahash").agg(
        F.min("asset_id").alias("asset_id"),
        F.count(F.lit(1)).alias("group_size"),
    )
    reps = spill_checkpoint(groups.select("asset_id", "ahash"))
    sizes = groups.select(
        F.col("asset_id").alias("_rid"), "group_size"
    )
    pairs = _ahash_block_pairs(reps, max_hamming, n_blocks=max_hamming + 1)
    return (
        pairs.join(
            sizes.withColumnRenamed("_rid", "asset_a").withColumnRenamed(
                "group_size", "size_a"
            ),
            "asset_a",
        )
        .join(
            sizes.withColumnRenamed("_rid", "asset_b").withColumnRenamed(
                "group_size", "size_b"
            ),
            "asset_b",
        )
        .select(
            F.col("asset_a").alias("rep_a"),
            F.col("asset_b").alias("rep_b"),
            "hamming",
            F.col("size_a").cast("long").alias("size_a"),
            F.col("size_b").cast("long").alias("size_b"),
            (F.col("size_a") * F.col("size_b"))
            .cast("long")
            .alias("n_cross_pairs"),
        )
    )


FRAME_SUM_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_sum", T.LongType()),
        T.StructField("frame_px", T.LongType()),
    ]
)


def frame_sums(assets: DataFrame) -> DataFrame:
    """Per-frame total byte mass of every video payload (asset_id,
    frame_idx, frame_sum, frame_px): the decode runs through the real
    Arrow ``mapInPandas`` path (fake codec — frame i is rows
    [i*h, (i+1)*h) of the tiled raster), and the sums are EXACT
    integers (uint8 summed in int64), which is what lets the shot
    rule downstream be replayed bit-for-bit in SQL via the tiled
    stream's prefix-sum closed form."""

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for asset_id, payload, meta in zip(
                pdf["asset_id"], pdf["payload"], pdf["meta"]
            ):
                if meta["media_type"] != "video" or not meta["n_frames"]:
                    continue
                w, h, c = (
                    int(meta["width"]),
                    int(meta["height"]),
                    int(meta["n_channels"] or 3),
                )
                n = int(meta["n_frames"])
                stack = fake_decode(payload, w, h * n, c).reshape(n, -1)
                sums = stack.sum(axis=1, dtype=np.int64)
                for i in range(n):
                    rows.append(
                        {
                            "asset_id": asset_id,
                            "frame_idx": i,
                            "frame_sum": int(sums[i]),
                            "frame_px": h * w * c,
                        }
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in FRAME_SUM_SCHEMA.fields]
            )

    return assets.filter(F.col("meta.media_type") == "video").mapInPandas(
        work, FRAME_SUM_SCHEMA
    )


def shot_stats(
    assets: DataFrame, jump_num: int = 4, jump_den: int = 10
) -> DataFrame:
    """Shot-boundary detection per video (the scene-segmentation pass
    a video training pipeline runs before frame dedup / clip
    extraction): a boundary is a frame whose total byte mass jumps by
    more than ``jump_num/jump_den`` gray levels PER PIXEL-CHANNEL vs
    its predecessor — evaluated as the exact integer predicate
    ``jump_den * |Δsum| > jump_num * frame_px`` (no division, no
    floats). Output per asset: ``n_frames``, ``n_shots`` (boundaries
    + 1), ``max_jump``.

    Scale: the decode emits n_frames summary rows per video (never
    rasters); ONE asset-keyed shuffle serves the lag window and the
    final combinable aggregate — the counter_delta shape on the frame
    axis.
    """
    from pyspark.sql import Window as W

    fs = frame_sums(assets)
    w = W.partitionBy("asset_id").orderBy("frame_idx")
    j = fs.withColumn(
        "_jump",
        F.abs(F.col("frame_sum") - F.lag("frame_sum").over(w)),
    )
    boundary = (
        F.col("_jump").isNotNull()
        & (F.col("_jump") * jump_den > F.col("frame_px") * jump_num)
    ).cast("long")
    return j.groupBy("asset_id").agg(
        F.count(F.lit(1)).alias("n_frames"),
        (F.sum(boundary) + 1).cast("long").alias("n_shots"),
        F.coalesce(F.max("_jump"), F.lit(0)).cast("long").alias("max_jump"),
    )


# VAD constants shared with the catalog oracle: frames of VAD_FRAME
# samples; a frame is ACTIVE iff its abs-sample sum exceeds
# VAD_THRESHOLD (calibrated to the shipped corpus's median frame
# energy so both branches populate; declared, replayed in SQL).
VAD_FRAME = 25
VAD_THRESHOLD = 610000

VAD_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("frame_idx", T.LongType(), False),
        T.StructField("absum", T.LongType(), False),
    ]
)


def vad_frame_energy(assets: DataFrame, frame: int = VAD_FRAME) -> DataFrame:
    """Per-frame abs-sample energy of each audio clip through the REAL
    Arrow decode path: the waveform is cut into full ``frame``-sample
    frames (the trailing partial frame is dropped BY DECLARATION —
    clips shorter than one frame emit nothing) and each frame reports
    the exact integer sum of absolute samples. Rasters/waveforms never
    leave the Arrow batch — n_frames summary rows per clip."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_a: list = []
            out_f: list = []
            out_s: list = []
            for asset_id, payload, meta in zip(
                pdf["asset_id"], pdf["payload"], pdf["meta"]
            ):
                if meta["media_type"] != "audio":
                    continue
                wave = decode_payload(payload, meta).astype(np.int64)
                nf = len(wave) // frame
                if nf == 0:
                    continue
                sums = (
                    np.abs(wave[: nf * frame]).reshape(nf, frame).sum(axis=1)
                )
                out_a.extend([asset_id] * nf)
                out_f.extend(range(nf))
                out_s.extend(int(x) for x in sums)
            yield pd.DataFrame(
                {"asset_id": out_a, "frame_idx": out_f, "absum": out_s},
                columns=["asset_id", "frame_idx", "absum"],
            )

    return assets.filter(F.col("meta.media_type") == "audio").mapInPandas(
        extract, VAD_FRAME_SCHEMA
    )


def vad_segments(
    assets: DataFrame,
    frame: int = VAD_FRAME,
    threshold: int = VAD_THRESHOLD,
) -> DataFrame:
    """Voice-activity-style segmentation per audio clip (the
    silence-trim / speech-extraction pass an audio training pipeline
    runs before transcription or clip packing): frames are ACTIVE iff
    their exact integer energy exceeds ``threshold``; consecutive
    active frames form segments (gaps-and-islands over the frame
    axis). Output per clip: frame/active counts, segment count,
    longest segment, active ratio.

    Scale: the decode emits n_frames summary rows per clip (the
    shot_stats shape on the audio axis); ONE asset-keyed shuffle
    serves the lag window, the segment-id running sum, the unordered
    per-(asset, segment) run-length window and the final combinable
    aggregate. The two doubles are a <2^53 int cast + one division.
    """
    from pyspark.sql import Window as W

    fs = vad_frame_energy(assets, frame)
    act = fs.withColumn(
        "active", (F.col("absum") > F.lit(threshold)).cast("int")
    )
    w = W.partitionBy("asset_id").orderBy("frame_idx")
    is_start = (
        (F.col("active") == 1)
        & (F.coalesce(F.lag("active").over(w), F.lit(0)) == 0)
    ).cast("int")
    d = act.withColumn("is_start", is_start).withColumn(
        "seg_id",
        F.sum("is_start").over(w.rowsBetween(W.unboundedPreceding, 0)),
    )
    # run length of the segment each ACTIVE row belongs to (inactive
    # rows share the preceding segment's id but do not count)
    run_len = F.sum("active").over(W.partitionBy("asset_id", "seg_id"))
    d = d.withColumn("run_len", run_len)
    return d.groupBy("asset_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_frames"),
        F.sum("active").cast("long").alias("n_active"),
        F.sum("is_start").cast("long").alias("n_segments"),
        F.coalesce(
            F.max(F.when(F.col("active") == 1, F.col("run_len"))),
            F.lit(0),
        ).cast("long").alias("longest_run"),
        (
            F.sum("active").cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("active_ratio"),
    )
