"""Query-catalog registry.

Importing the catalog modules registers every query/oracle pair; the
dicts are then REORDERED by verification history. The driver's
correctness gate checks the first 50 ``queries()`` entries per round,
so iteration order decides which entries get a fresh
``CORRECTNESS_r{N}`` row. Priority (front to back):

1. entries the round-2 window missed (checked once in r01, or — for
   ``events_heavy_hitters`` — never),
2. anything NOT named in the lists below: new operators land here
   automatically, so a freshly added entry can never be shadowed by
   the 50-entry window in its first round,
3. ``mm_image_features`` (r01 errored, green only since r02) and the
   round-2 additions (one green round each),
4. the round-1-era entries with two green rounds of evidence — the
   only ones that can afford to rotate out of the window.

Round-5 handoff: the front of the window currently holds exactly 50
never-driver-checked entries (round-3 + round-4 additions; every one
is locally gate-verified at sf0.01 — see BASELINE.md round 4). Once
CORRECTNESS_r04 lands green, move those names into a `_NEW_R04` tail
list (one green round) to reopen window headroom before adding new
catalog entries; the import-time assert below enforces this.
"""

from . import catalog_docs  # noqa: F401  (registers queries)
from . import catalog_emb  # noqa: F401
from . import catalog_mm  # noqa: F401
from . import catalog_scalar  # noqa: F401
from . import catalog_tpch  # noqa: F401
from . import catalog_windows  # noqa: F401
from .catalog import ORACLE, QUERIES

# checked once in r01, then shadowed by the 50-entry window in r02
# (events_heavy_hitters was ADDED in r02 at position 51: never checked)
_SHADOWED_R02 = [
    "events_heavy_hitters",
    "events_salted_user_totals",
    "events_grouping_sets",
    "events_active_time",
    "events_sessionization",
    "events_asof_last_view",
    "events_first_purchase",
    "orders_running_total",
    "top3_orders_per_customer",
]

# one green round so far: r01 hard error (histogram canonicalization),
# fixed and green since r02
_FIXED_R02 = ["mm_image_features"]

# added in round 2 inside the window: one green round (r02)
_NEW_R02 = [
    "media_assets_inventory",
    "events_conversion_map",
    "docs_simhash_quality",
    "docs_train_split",
    "docs_token_packing",
    "docs_chunking",
    "docs_contamination",
    "docs_repetition",
    "docs_pii_scan",
    "emb_kmeans_quality",
    "emb_hamming_topk",
]


def _priority_order(names: list[str]) -> list[str]:
    listed = set(_SHADOWED_R02) | set(_FIXED_R02) | set(_NEW_R02) | set(
        _R01_TWICE
    )
    fresh = [n for n in names if n not in listed]  # new this round or later
    order = (
        [n for n in _SHADOWED_R02 if n in names]
        + fresh
        + [n for n in _FIXED_R02 if n in names]
        + [n for n in _NEW_R02 if n in names]
        + [n for n in _R01_TWICE if n in names]
    )
    assert len(order) == len(names), "catalog reorder dropped an entry"
    # Never-checked entries (shadowed + fresh) must FIT the driver's
    # 50-entry window; when a new entry trips this, promote more
    # multi-green entries into _R01_TWICE / _NEW_R02 to free slots
    # instead of silently pushing an unverified entry past the edge.
    n_front = len([n for n in _SHADOWED_R02 if n in names]) + len(fresh)
    assert n_front <= 50, (
        f"{n_front} never-checked entries exceed the 50-entry "
        "correctness window — rebalance the rotation lists"
    )
    return order


# two green rounds (r01 + r02): safe to rotate past the window edge.
# Most-established families last.
_R01_TWICE = [
    "docs_exact_dedup",
    "docs_fingerprint",
    "docs_token_stats",
    "docs_quality_score",
    "docs_ngram_jaccard",
    "docs_minhash_near_dup",
    "docs_simhash_near_dup",
    "docs_lang_stats",
    "docs_language_id",
    "training_data_assembly",
    "emb_topk_cosine",
    "emb_centroid_assign",
    "emb_cosine_near_dup",
    "emb_ivf_topk",
    "emb_ivf_topk_fullprobe",
    "mm_asset_inventory",
    "mm_image_decode_dims",
    "mm_frame_sample",
    "mm_audio_stats",
    "mm_resize_checksum",
    "events_props_buckets",
    "events_scalar_showcase",
    "events_pivot_types",
    "events_cube_day_type",
    "events_approx_distinct",
    "events_daily_engagement",
    "events_high_water_mark",
    "events_latest_per_user",
    "customer_cohort_setops",
    "media_channel_projection",
    "customers_with_orders",
    "customers_without_recent_orders",
    "parts_price_band_join",
    "q3_top_orders",
    "q5_region_revenue",
    "rollup_returnflag_status",
    "q6_forecast_revenue",
    "q1_pricing_summary",
]

_order = _priority_order(list(QUERIES))
_q = {n: QUERIES[n] for n in _order}
_o = {n: ORACLE[n] for n in _order if n in ORACLE}
QUERIES.clear()
QUERIES.update(_q)
ORACLE.clear()
ORACLE.update(_o)

__all__ = ["QUERIES", "ORACLE"]
