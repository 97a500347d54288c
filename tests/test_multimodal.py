"""Multimodal operator tests: decode contract, resize math, frame
sampling, Arrow batch plumbing, determinism across partitionings."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from wistia_data_pipeline_project_spark.operators import multimodal as M


@pytest.fixture(scope="module")
def assets(spark):
    docs = spark.createDataFrame(
        [(i, f"document number {i} " + "lorem ipsum " * (i % 5 + 1)) for i in range(30)],
        "doc_id long, text string",
    )
    return M.attach_fake_assets(docs).cache()


def test_fake_decode_shape_and_determinism():
    a1 = M.fake_decode(b"hello world", 10, 6, 3)
    a2 = M.fake_decode(b"hello world", 10, 6, 3)
    assert a1.shape == (6, 10, 3)
    assert a1.dtype == np.uint8
    assert (a1 == a2).all()
    # tiling: first bytes are the payload itself
    assert bytes(a1.ravel()[:11]) == b"hello world"


def test_fake_decode_empty_payload():
    a = M.fake_decode(b"", 4, 4, 3)
    assert a.shape == (4, 4, 3) and (a == 0).all()


def test_decode_payload_rejects_unknown_modality():
    with pytest.raises(NotImplementedError):
        M.decode_payload(b"x", {"media_type": "hologram"})


def test_fake_decode_audio_samples():
    wave = M.fake_decode_audio(b"\x01\x00\xff\xff\x00\x80\x07")  # odd byte dropped
    assert wave.tolist() == [1, -1, -32768]


def test_audio_features(spark, assets):
    feats = {r["asset_id"]: r for r in M.audio_features(assets).collect()}
    metas = {
        r["asset_id"]: r
        for r in assets.select(
            "asset_id", "meta.media_type", F.length("payload").alias("n_bytes")
        ).collect()
        if r["media_type"] == "audio"
    }
    assert set(feats) == set(metas)
    for aid, f in feats.items():
        assert f["n_samples"] == metas[aid]["n_bytes"] // 2
        assert f["duration_s"] == pytest.approx(f["n_samples"] / 16000.0)
        assert f["rms"] >= 0.0


def test_nearest_resize_known_values():
    arr = np.arange(16, dtype=np.uint8).reshape(4, 4, 1)
    out = M._nearest_resize(arr, 2, 2)
    # rows 0,2 / cols 0,2 of the source
    assert out.shape == (2, 2, 1)
    assert out.ravel().tolist() == [0, 2, 8, 10]


def test_image_features_schema_and_rows(assets):
    feats = M.image_features(assets)
    rows = {r["asset_id"]: r for r in feats.collect()}
    want_images = {
        r["asset_id"]
        for r in assets.select("asset_id", "meta.media_type").collect()
        if r["media_type"] == "image"
    }
    assert set(rows) == want_images
    for r in rows.values():
        assert r["width"] == r["asset_id"] % 32 + 8
        assert r["height"] == r["asset_id"] % 24 + 8
        assert 0 <= r["mean_pixel"] <= 255
        assert len(r["histogram"]) == 8
        assert sum(r["histogram"]) == r["width"] * r["height"] * 3


def test_image_features_partitioning_invariant(assets):
    one = M.image_features(assets.coalesce(1)).orderBy("asset_id").collect()
    many = M.image_features(assets.repartition(7)).orderBy("asset_id").collect()
    assert one == many


def test_resize_images_payload_size(assets):
    out = M.resize_images(assets, 8, 8).collect()
    assert out, "no images resized"
    for r in out:
        assert len(r["payload"]) == 8 * 8 * 3


def test_sample_frames_indices(assets):
    frames = M.sample_frames(assets, every_k=2)
    got = frames.groupBy("asset_id").agg(
        F.count(F.lit(1)).alias("n"), F.max("frame_idx").alias("max_idx")
    )
    metas = {
        r["asset_id"]: r["n_frames"]
        for r in assets.select("asset_id", "meta.n_frames", "meta.media_type").collect()
        if r["media_type"] == "video"
    }
    rows = {r["asset_id"]: r for r in got.collect()}
    assert set(rows) == set(metas)
    for aid, n_frames in metas.items():
        assert rows[aid]["n"] == -(-n_frames // 2)  # ceil(n/2)
        assert rows[aid]["max_idx"] == (n_frames - 1) // 2 * 2


def test_mm_oracle_corpus_assumptions_hold():
    """The mm pixel/resize oracles index text by CHARACTERS while the
    engine tiles BYTES, and tile by `% len`: both are valid only while
    the corpus is pure ASCII with no empty documents. Enforce the
    assumption so a future data change fails HERE with a message, not
    as a silent oracle divergence."""
    import duckdb

    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        path = f"/root/testdata/{sf}/documents.parquet"
        non_ascii, empty = duckdb.sql(
            f"""SELECT
                  COUNT(*) FILTER (WHERE octet_length(encode(text)) <> length(text)),
                  COUNT(*) FILTER (WHERE length(text) = 0)
                FROM '{path}'"""
        ).fetchone()
        assert non_ascii == 0, f"{sf}: non-ASCII docs break byte/char oracle parity"
        assert empty == 0, f"{sf}: empty docs break the % len tiling oracle"


def test_average_hash_deterministic_and_robust(spark, assets):
    h1 = {r["asset_id"]: r["ahash"] for r in M.average_hash(assets).collect()}
    h2 = {
        r["asset_id"]: r["ahash"]
        for r in M.average_hash(assets.repartition(7)).collect()
    }
    assert h1 == h2 and h1  # deterministic across partitionings
    # identical payloads hash identically; a perturbed copy stays close
    img = assets.filter(F.col("meta.media_type") == "image").first()
    perturbed = bytes(img["payload"])[:-3] + b"\x00\x01\x02"
    two = spark.createDataFrame(
        [
            (1000, img["payload"], img["meta"]),
            (1001, img["payload"], img["meta"]),
            (1002, perturbed, img["meta"]),
        ],
        assets.schema,
    )
    hh = {r["asset_id"]: r["ahash"] for r in M.average_hash(two).collect()}
    assert hh[1000] == hh[1001]
    assert bin(hh[1000] ^ hh[1002]).count("1") <= 8  # few-byte change -> few bits


def test_image_near_dup_pairs_finds_planted_duplicate(spark, assets):
    img = assets.filter(F.col("meta.media_type") == "image").limit(2).collect()
    planted = spark.createDataFrame(
        [(9000 + i, r["payload"], r["meta"]) for i, r in enumerate(img)]
        + [(9100, img[0]["payload"], img[0]["meta"])],  # exact dup of 9000
        assets.schema,
    )
    pairs = {
        (r["asset_a"], r["asset_b"]): r["hamming"]
        for r in M.image_near_dup_pairs(planted, max_hamming=3).collect()
    }
    assert pairs.get((9000, 9100)) == 0
    assert (9000, 9001) not in pairs  # different images stay apart


def test_image_dedup_cascade_collapses_exact_groups(spark):
    """Three byte-identical thumbnails + one near-dup + one far image:
    the exact group collapses to rep 1 (size 3), the near-dup pairs
    with it once carrying n_cross_pairs = 3*1, and the far image pairs
    with nobody. The raw pair entry would emit C(3,2)=3 hamming-0
    pairs the cascade never materializes."""
    from wistia_data_pipeline_project_spark.operators.multimodal import (
        attach_fake_thumbnails,
        image_dedup_cascade,
        image_near_dup_pairs,
    )

    base = "the quick brown fox jumps over the lazy dog " * 8
    near = base[:-6] + "cat et"           # small byte change
    far = "".join(chr(33 + (i * 7) % 90) for i in range(len(base)))
    rows = [(1, base), (2, base), (3, base), (4, near), (5, far)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    thumbs = attach_fake_thumbnails(docs)

    raw = image_near_dup_pairs(thumbs, max_hamming=3).collect()
    n_exact_raw = sum(1 for r in raw if r.hamming == 0)
    assert n_exact_raw == 3  # C(3,2) identical-group pairs

    out = {(r.rep_a, r.rep_b): r for r in
           image_dedup_cascade(thumbs, max_hamming=3).collect()}
    # no hamming-0 pairs survive the collapse
    assert all(r.hamming >= 1 for r in out.values())
    # if the near-dup pairs with the identical group in the RAW
    # entry, the cascade must carry it once via the representative
    # with the full multiplicity
    if any({r.asset_a, r.asset_b} & {1, 2, 3} and 4 in (r.asset_a, r.asset_b)
           for r in raw):
        r = out[(1, 4)]
        assert (r.size_a, r.size_b, r.n_cross_pairs) == (3, 1, 3)
    # the far image never pairs
    assert not any(5 in k for k in out)


def test_ahash_block_pairs_pigeonhole_completeness(spark):
    """A hamming-4 pair engineered to put ONE differing bit in each
    16-bit lane is invisible to the fixed 4-lane join (the raw
    entry's documented recall caveat) but MUST be found when the lane
    count is derived as max_hamming+1 — the cascade's guarantee."""
    from wistia_data_pipeline_project_spark.operators.multimodal import (
        _ahash_block_pairs,
    )

    base = 0x0123456789ABCDEF
    # flip bit 0 of each 16-bit lane: hamming 4, one bit per lane
    adv = base ^ ((1 << 0) | (1 << 16) | (1 << 32) | (1 << 48))
    codes = spark.createDataFrame(
        [(1, base), (2, adv)], "asset_id long, ahash long"
    )
    missed = _ahash_block_pairs(codes, max_hamming=4, n_blocks=4).collect()
    assert missed == []  # 4 lanes: the adversarial pair shares none
    found = _ahash_block_pairs(codes, max_hamming=4, n_blocks=5).collect()
    assert [(r.asset_a, r.asset_b, r.hamming) for r in found] == [(1, 2, 4)]


def test_ahash_block_pairs_rejects_bad_lane_count(spark):
    codes = spark.createDataFrame([(1, 0)], "asset_id long, ahash long")
    with pytest.raises(ValueError, match="n_blocks"):
        M._ahash_block_pairs(codes, max_hamming=1, n_blocks=1)


def test_spill_checkpoint_rejects_bad_level(spark, monkeypatch):
    """A typo'd SPARK_GRAFT_CKPT_LEVEL must fail as a clear config
    error naming the variable, not an AttributeError mid-operator."""
    from wistia_data_pipeline_project_spark.ckpt import spill_checkpoint

    df = spark.range(3)
    monkeypatch.setenv("SPARK_GRAFT_CKPT_LEVEL", "disk_only")
    with pytest.raises(ValueError, match="SPARK_GRAFT_CKPT_LEVEL"):
        spill_checkpoint(df)
    monkeypatch.setenv("SPARK_GRAFT_CKPT_LEVEL", "__doc__")
    with pytest.raises(ValueError, match="SPARK_GRAFT_CKPT_LEVEL"):
        spill_checkpoint(df)
    monkeypatch.setenv("SPARK_GRAFT_CKPT_LEVEL", "DISK_ONLY")
    assert spill_checkpoint(df).count() == 3


def test_shot_stats_hand_built_boundary(spark):
    """Known payload: 3 one-pixel-row frames (2 px/frame, 1 channel)
    with byte mass 0 / 200 / 200 -> exactly one boundary (jump 200
    over fpx 2 clears 10*jump > 4*fpx), n_shots = 2."""
    from wistia_data_pipeline_project_spark.operators.multimodal import (
        shot_stats,
    )

    schema = (
        "asset_id long, payload binary, meta struct<"
        "media_type:string,format:string,width:int,height:int,"
        "n_channels:int,sample_rate:int,n_frames:int>"
    )
    rows = [
        (
            1,
            bytearray([0, 0, 100, 100, 100, 100]),
            ("video", "fake", 2, 1, 1, None, 3),
        ),
        # single-frame video: no transitions -> 1 shot, max_jump 0
        (2, bytearray([9, 9]), ("video", "fake", 2, 1, 1, None, 1)),
        # image rows are filtered out entirely
        (3, bytearray([1, 2, 3]), ("image", "fake", 1, 1, 3, None, None)),
    ]
    df = spark.createDataFrame(rows, schema)
    got = {r.asset_id: r for r in shot_stats(df).collect()}
    assert set(got) == {1, 2}
    assert (got[1].n_frames, got[1].n_shots, got[1].max_jump) == (3, 2, 200)
    assert (got[2].n_frames, got[2].n_shots, got[2].max_jump) == (1, 1, 0)


def test_vad_segments_hand_computed(spark):
    """Crafted 50-char blocks: '~' frames (25 * 32382 = 809550) are
    active, ' ' frames (25 * 8224 = 205600) are not; the trailing
    partial frame drops; a sub-frame clip emits nothing."""
    from wistia_data_pipeline_project_spark.operators import (
        multimodal as M,
    )

    rows = [
        # doc_id % 3 == 1 -> audio
        (1, "~" * 50 + " " * 50 + "~" * 50 + "~" * 30),
        (4, " " * 40),            # < one frame: excluded
        (7, "~" * 100),           # two active frames, one segment
        (2, "~" * 100),           # video: not an audio asset
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    assets = M.attach_fake_assets(docs)
    out = {r["asset_id"]: r for r in M.vad_segments(assets).collect()}
    assert set(out) == {1, 7}
    r1 = out[1]
    assert (r1["n_frames"], r1["n_active"], r1["n_segments"]) == (3, 2, 2)
    assert r1["longest_run"] == 1
    assert abs(r1["active_ratio"] - 2 / 3) < 1e-15
    r7 = out[7]
    assert (r7["n_frames"], r7["n_segments"], r7["longest_run"]) == (2, 1, 2)
    assert r7["active_ratio"] == 1.0
