"""Sinks: partitioned table writers.

The reference has NO sinks — its only output is the returned DataFrame
(reference core.py:112-116; SURVEY.md §2.1). These helpers are the
Spark-native write surface, with the layout controls that matter at
100 TB:

* ``partition_by`` — hive-style directory partitioning; downstream
  readers get partition pruning on those columns for free.
* ``max_records_per_file`` — bounds file sizes so a skewed partition
  doesn't produce one multi-GB file (readers parallelize per file).
* ``buckets`` — persistent hash bucketing on join/group keys: two
  tables bucketed the same way join with ZERO shuffle (requires
  ``saveAsTable``; bucket metadata lives in the catalog).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    max_records_per_file: int | None = None,
    compression: str | None = None,
    **options: str,
) -> None:
    """Write a DataFrame to ``path`` as parquet/csv/json/orc.

    CSV writes include a header to round-trip with
    ``sources.readers.read_csv``'s header default.
    """
    writer = df.write.mode(mode).format(fmt)
    if fmt == "csv":
        writer = writer.option("header", "true")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    if compression:
        writer = writer.option("compression", compression)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    buckets: int,
    bucket_cols: list[str],
    sort_cols: list[str] | None = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Persist as a catalog table hash-bucketed on ``bucket_cols``.

    Equal bucketing on both sides of a join lets Catalyst plan a
    SortMergeJoin with no Exchange — the co-located-join strategy for
    repeatedly-joined 100 TB fact tables.
    """
    writer = df.write.mode(mode).format(fmt).bucketBy(buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def compact_table(
    spark,
    path: str,
    target_records_per_file: int,
    fmt: str = "parquet",
    partition_by: list[str] | None = None,
) -> int:
    """Rewrite a table directory into right-sized files; returns the
    new file count.

    The small-files problem: a streaming sink or a highly-parallel
    write leaves thousands of tiny files, and at 100 TB the NameNode/
    listing overhead plus per-file task scheduling dominate read cost.
    Compaction is read → repartition to ceil(rows/target) → rewrite.
    The repartition is a round-robin shuffle ONLY to balance output
    sizes (no key semantics lost — hive-style ``partition_by`` dirs
    are regenerated); the row count comes from the scan Spark performs
    anyway, and the rewrite goes through a temp suffix so a failed
    compaction never destroys the source.

    The swap and the file count go through the Hadoop FileSystem API
    (resolved from the path's own scheme), so the same call works on
    hdfs:// and s3a:// table dirs, not just the driver's local disk —
    the deployment where small files actually hurt. A failed rewrite
    or verification deletes the temp copy instead of leaking a
    full-size duplicate of the table.
    """
    import math

    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    HPath = jvm.org.apache.hadoop.fs.Path
    fs = HPath(path).getFileSystem(hconf)

    # Hive partition-column values must round-trip verbatim: value
    # TYPE re-inference would rewrite day='01' as day=1, silently
    # changing both the column type and the directory layout. The
    # inference toggle is a session conf, and mutating the CALLER's
    # session would make every concurrent query on it transiently see
    # string-typed partition columns — so all compaction reads/writes
    # run in a newSession(): same SparkContext (same executors, same
    # data), but an isolated SQLConf that nothing else observes.
    scoped = spark.newSession()
    scoped.conf.set("spark.sql.sources.partitionColumnTypeInference.enabled", "false")

    def read_back(p: str) -> DataFrame:
        reader = scoped.read.format(fmt)
        if fmt == "csv":
            # write_table writes CSV WITH a header; reading it back
            # bare would ingest every file's header line as data and
            # rename columns to _c0/_c1 — and the count-based verify
            # compares two identically mis-read frames, so the
            # corruption would pass silently (round-7 review).
            reader = reader.option("header", "true")
        return reader.load(p)

    df = read_back(path)
    n = df.count()
    files = max(1, math.ceil(n / target_records_per_file))
    # Round-robin balances sizes for the unpartitioned layout; for a
    # partitioned one it would scatter every hive partition across
    # all tasks (files x partitions output files — MORE fragments
    # than before). Hash-repartitioning on the partition columns
    # sends each partition's rows to one task: one file per dir.
    repartitioned = (
        df.repartition(files, *partition_by)
        if partition_by
        else df.repartition(files)
    )
    tmp = path.rstrip("/") + "__compact_tmp"
    try:
        write_table(
            repartitioned,
            tmp,
            fmt=fmt,
            partition_by=partition_by,
            max_records_per_file=target_records_per_file,
        )
        # Verify the compacted copy BEFORE touching the source: a
        # lost-rows rewrite must leave the original directory intact.
        if read_back(tmp).count() != n:
            raise RuntimeError(
                f"compaction of {path} lost rows; source left untouched"
            )
    except BaseException:
        fs.delete(HPath(tmp), True)
        raise
    # Swap: move the source aside, point the final path at the compacted
    # copy, and only then drop the old data — a crash mid-swap leaves
    # either the original or both copies on disk, never neither.
    old = path.rstrip("/") + "__compact_old"
    if not fs.rename(HPath(path), HPath(old)):
        fs.delete(HPath(tmp), True)
        raise RuntimeError(f"could not move {path} aside for the swap")
    if not fs.rename(HPath(tmp), HPath(path)):
        restored = fs.rename(HPath(old), HPath(path))  # roll back
        fs.delete(HPath(tmp), True)
        # report the TRUE state: a failed rollback strands the data at
        # the __compact_old path — claiming "restored" would send the
        # operator looking in the wrong place (round-7 review)
        raise RuntimeError(
            f"swap into {path} failed; "
            + ("source restored" if restored else f"source stranded at {old}")
        )
    if not fs.delete(HPath(old), True):
        import warnings

        warnings.warn(
            f"compaction succeeded but could not delete {old}; a full-size "
            "copy of the table remains there",
            stacklevel=2,
        )
    it = fs.listFiles(HPath(path), True)
    count = 0
    while it.hasNext():
        if it.next().getPath().getName().endswith("." + fmt):
            count += 1
    return count
