"""DuckDB-oracle parity for every registered query (the driver's gate,
run locally at sf0.01). Each query must match on row count, column
names, and values; exact (hash-grade) equality is asserted too since
the inventory is engineered for cross-engine bit-equality."""

from __future__ import annotations

import pytest

from xorbits_sql_spark.queries import load_all

from .conftest import SF_ORACLE
from .oracle import compare, exact_match

SPECS = load_all()
ORACLE_CASES = [name for name, s in sorted(SPECS.items()) if s.oracle is not None]
ROWS_ONLY_CASES = [name for name, s in sorted(SPECS.items()) if s.oracle is None]


# The driver's canonicalizer sorts result cells with pandas, which
# raises `TypeError: unhashable type` on list/dict cells — so an
# oracle-paired query whose output schema contains ARRAY/MAP/STRUCT
# can NEVER earn a hash-green driver row, even with perfect values
# (the s63 round-6 red cell; tests/oracle.py:37 quietly tuple-izes
# list cells, which is why local parity passed where the driver
# died). This gate makes the local harness driver-grade for output
# *shape* the same way _canon_cell's numeric class made it
# driver-grade for typing: serialize sequences before output
# (array_join / md5-fold — the s79/s05/s63 pattern).
def _assert_atomic_schema(name, schema):
    from pyspark.sql.types import ArrayType, MapType, StructType

    bad = [
        f.name
        for f in schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not bad, (
        f"{name}: oracle-paired output has non-scalar column(s) {bad} "
        f"({schema.simpleString()}) — the driver's canonicalizer cannot "
        "hash these; serialize (e.g. F.array_join) before output"
    )


@pytest.mark.parametrize("name", ORACLE_CASES)
def test_oracle_parity(name, spark, duck):
    spec = SPECS[name]
    sdf_spark = spec.fn(spark, SF_ORACLE)
    _assert_atomic_schema(name, sdf_spark.schema)
    sdf = sdf_spark.toPandas()
    ddf = duck.execute(spec.oracle).fetchdf()
    problems = compare(sdf, ddf)
    assert not problems, f"{name}: " + "; ".join(problems)
    assert exact_match(sdf, ddf), f"{name}: values differ below tolerance (hash would mismatch)"


# Rows-only entries have no DuckDB value oracle, so the driver's
# schema/hash gates can't catch dtype drift there. Each pins the exact
# output schema it promises the driver (round-5 verdict #7); changing
# one of these queries' types is a deliberate act that must update the
# pin in the same commit.
ROWS_ONLY_SCHEMAS = {
    "q82_stream_running_totals": "struct<user_id:bigint,n_events:bigint,total_value:double>",
    "q89_distinct_sketch": "struct<event_type:string,approx_users:bigint,hll_users:bigint,exact_users:bigint>",
    # orientation added round 10 (EXIF plumbing, ADVICE r09); q90
    # re-entered the driver window for the schema change
    "q90_multimodal_features": "struct<id:bigint,n_bytes:bigint,mean_byte:double,hash_hi:bigint,orientation:int>",
    "q91_multimodal_frames": "struct<id:bigint,n_frames:bigint,frame_bytes:bigint>",
    "q93_approx_ntile": "struct<tile:int,n:bigint,tile_total:double>",
    "s47_bpe_learn_merges": "struct<rank:bigint,left:string,right:string,merged:string,pair_count:bigint>",
    "s68_stream_welford_anomalies": "struct<user_id:bigint,n:bigint,mean:double,m2:double,n_alerts:bigint>",
    "s81_hll_sketch_rollup": "struct<event_type:string,n_daily_sketches:bigint,merged_distinct_users:bigint>",
    "t52_stream_window_percentiles": "struct<hour:timestamp,event_type:string,p50:double,p90:double,p99:double,n:bigint>",
}


def test_rows_only_schema_pins_complete():
    """Every rows-only entry must have a schema pin (and no stale pins)."""
    assert sorted(ROWS_ONLY_SCHEMAS) == ROWS_ONLY_CASES


@pytest.mark.parametrize("name", ROWS_ONLY_CASES)
def test_rows_only(name, spark):
    spec = SPECS[name]
    df = spec.fn(spark, SF_ORACLE)
    assert df.count() >= 0
    pinned = ROWS_ONLY_SCHEMAS.get(name)
    assert pinned is not None, f"{name}: rows-only entry missing a schema pin"
    assert df.schema.simpleString() == pinned, (
        f"{name}: output schema drifted from its pin\n"
        f"  got:    {df.schema.simpleString()}\n"
        f"  pinned: {pinned}"
    )
