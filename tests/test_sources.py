"""Source/sink roundtrips: partitioned writers, JSONL reader, CSV shim."""

from __future__ import annotations

import os

from pyspark.sql import Row
from pyspark.sql import functions as F

from xorbits_sql_spark.sources import read_jsonl, write_table


def _df(spark):
    return spark.createDataFrame(
        [
            Row(k="a", d="2024-01-01", v=1.5),
            Row(k="b", d="2024-01-01", v=2.5),
            Row(k="a", d="2024-01-02", v=3.5),
        ]
    )


def test_write_parquet_partitioned_roundtrip(spark, tmp_path):
    path = str(tmp_path / "out_parquet")
    write_table(_df(spark), path, partition_by=["d"], max_records_per_file=1000)
    # hive-style layout → partition pruning on d
    assert any(e.startswith("d=") for e in os.listdir(path))
    back = spark.read.parquet(path)
    assert back.count() == 3
    pruned = back.filter(F.col("d") == "2024-01-01")
    assert pruned.count() == 2


def test_write_csv_roundtrip(spark, tmp_path):
    path = str(tmp_path / "out_csv")
    write_table(_df(spark), path, fmt="csv")
    back = spark.read.option("header", "true").csv(path)
    assert back.count() == 3 and set(back.columns) == {"k", "d", "v"}


def test_jsonl_roundtrip(spark, tmp_path):
    path = str(tmp_path / "out_json")
    write_table(_df(spark), path, fmt="json")
    back = read_jsonl(spark, path, schema_dict={"k": "string", "d": "string", "v": "double"})
    assert back.count() == 3
    assert dict(back.dtypes)["v"] == "double"
