"""Z-order clustered write: per-file min/max stats must bound EVERY
clustered dimension (the data-skipping property), unlike a 1-column sort."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import Row

from nyctaxidatapipeline_spark.sinks import write_zordered


def _file_spans(path, col):
    """(max per-file span) / (global span) for a column, from parquet
    footer statistics only — what a scan planner prunes with."""
    spans, glo, ghi = [], None, None
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        lo = min(md.row_group(i).column(
            [md.schema.column(j).name
             for j in range(md.num_columns)].index(col)).statistics.min
            for i in range(md.num_row_groups))
        hi = max(md.row_group(i).column(
            [md.schema.column(j).name
             for j in range(md.num_columns)].index(col)).statistics.max
            for i in range(md.num_row_groups))
        spans.append(hi - lo)
        glo = lo if glo is None else min(glo, lo)
        ghi = hi if ghi is None else max(ghi, hi)
    return max(spans) / (ghi - glo), len(spans)


def test_zorder_bounds_both_dims(spark, tmp_path):
    # 64x64 grid — a worst case for 1-column sorts
    df = spark.createDataFrame([Row(x=float(i), y=float(j))
                                for i in range(64) for j in range(64)])
    zpath = str(tmp_path / "zorder")
    xpath = str(tmp_path / "xsort")
    write_zordered(df, zpath, ["x", "y"], n_files=16)
    (df.repartitionByRange(16, "x").sortWithinPartitions("x")
       .write.mode("overwrite").parquet(xpath))

    zx, n_zfiles = _file_spans(zpath, "x")
    zy, _ = _file_spans(zpath, "y")
    sx, _ = _file_spans(xpath, "x")
    sy, _ = _file_spans(xpath, "y")
    assert n_zfiles >= 8
    # the x-sort bounds x tightly but leaves y unbounded per file
    assert sx <= 0.15 and sy >= 0.9
    # z-order bounds BOTH dims well below the full domain
    assert zx <= 0.5 and zy <= 0.5, (zx, zy)
    # rows survive intact
    assert spark.read.parquet(zpath).count() == 64 * 64


class TestCompaction:
    """sinks.compact_parquet: the small-files rewrite."""

    def test_compact_merges_and_preserves_data(self, spark, tmp_path):
        src = str(tmp_path / "frag")
        df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        df.repartition(40).write.parquet(src)
        import os
        n_before = len([f for f in os.listdir(src)
                        if f.endswith(".parquet")])
        assert n_before >= 30  # genuinely fragmented
        before = sorted(map(tuple, spark.read.parquet(src).collect()))

        from nyctaxidatapipeline_spark.sinks import compact_parquet
        stats = compact_parquet(spark, src,
                                target_file_bytes=64 * 1024 * 1024)
        n_after = len([f for f in os.listdir(src)
                       if f.endswith(".parquet")])
        assert n_after == 1  # tiny table -> one file
        assert stats["files_before"] == n_before
        assert stats["files_after"] == 1
        after = sorted(map(tuple, spark.read.parquet(src).collect()))
        assert after == before
        # no leftover tmp/bak dirs
        assert not [p for p in os.listdir(tmp_path)
                    if "_compact_" in p]

    def test_compact_even_sizes_path(self, spark, tmp_path):
        src = str(tmp_path / "frag2")
        spark.range(10_000).write.parquet(src)
        from nyctaxidatapipeline_spark.sinks import compact_parquet
        stats = compact_parquet(spark, src, target_file_bytes=10_000,
                                even_sizes=True)
        assert stats["files_after"] >= 2  # split to target size
        assert (spark.read.parquet(src).count() == 10_000)
