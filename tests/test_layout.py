"""Z-order layout tests (functions/layout.py): Catalyst expression vs
Python reference, box-coverage of the cell enumeration, and the actual
partition-pruning property on a written table."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aristoteles_spark.functions.layout import (
    cells_for_box,
    morton16,
    morton16_py,
    zcell,
)


class TestMorton:
    def test_expression_matches_reference(self, spark):
        pts = [(x, y) for x in (0, 1, 5, 15, 100, 255) for y in (0, 2, 31, 255)]
        df = spark.createDataFrame(pts, "x int, y int").withColumn(
            "z", morton16(F.col("x"), F.col("y"))
        )
        for r in df.collect():
            assert r.z == morton16_py(r.x, r.y), (r.x, r.y)

    def test_bijective_on_8bit_grid(self):
        seen = {morton16_py(x, y) for x in range(64) for y in range(64)}
        assert len(seen) == 64 * 64

    def test_zcell_is_morton_of_high_bits(self, spark):
        df = spark.createDataFrame(
            [(x, y) for x in (0, 17, 130, 255) for y in (3, 16, 200)],
            "x int, y int",
        ).withColumn("c", zcell(F.col("x"), F.col("y")))
        for r in df.collect():
            assert r.c == morton16_py(r.x >> 4, r.y >> 4)


class TestCellEnumeration:
    @pytest.mark.parametrize(
        "box", [(0, 15, 0, 15), (32, 95, 8, 23), (0, 255, 0, 255), (7, 8, 15, 16)]
    )
    def test_every_point_covered(self, box):
        x_lo, x_hi, y_lo, y_hi = box
        cells = set(cells_for_box(*box))
        for x in range(x_lo, x_hi + 1, 3):
            for y in range(y_lo, y_hi + 1, 3):
                assert morton16_py(x, y) >> 8 in cells, (x, y)

    def test_enumeration_is_tight(self):
        # a 16x16-aligned box maps to exactly one cell
        assert cells_for_box(16, 31, 32, 47) == [morton16_py(1, 2)]

    def test_full_space_is_256_cells(self):
        assert len(cells_for_box(0, 255, 0, 255)) == 256


class TestPruning:
    def test_partition_pruning_reads_fewer_files(self, spark, tmp_path):
        """The point of the layout: a box filter pushed as a cell IN
        list must touch strictly fewer partition directories (and
        files) than the full table."""
        path = str(tmp_path / "ztab")
        df = spark.createDataFrame(
            [(i % 256, (i * 7) % 64, float(i)) for i in range(5000)],
            "x int, y int, v double",
        )
        df.withColumn("zc", zcell(F.col("x"), F.col("y"))).repartition(
            "zc"
        ).write.mode("overwrite").partitionBy("zc").parquet(path)

        back = spark.read.parquet(path)
        total_files = (
            back.select(F.input_file_name().alias("f")).distinct().count()
        )
        cells = cells_for_box(0, 31, 0, 15)  # one coarse corner
        boxed = back.filter(F.col("zc").isin(cells))
        boxed_files = (
            boxed.select(F.input_file_name().alias("f")).distinct().count()
        )
        assert boxed_files < total_files
        # and the data inside is exactly the box's superset cells
        vals = boxed.select("x", "y").collect()
        assert vals and all(
            morton16_py(r.x, r.y) >> 8 in set(cells) for r in vals
        )
        # value completeness: residual filter over pruned read == full scan
        exact_pruned = boxed.filter(
            F.col("x").between(0, 31) & F.col("y").between(0, 15)
        ).agg(F.sum("v")).first()[0]
        exact_full = df.filter(
            F.col("x").between(0, 31) & F.col("y").between(0, 15)
        ).agg(F.sum("v")).first()[0]
        assert exact_pruned == exact_full


class TestRangeShardLayout:
    def test_range_partitioned_write_has_disjoint_file_ranges(
        self, spark, tmp_path
    ):
        """srt1's physical side: repartitionByRange + sortWithinPartitions
        must produce files whose (key, id) ranges are pairwise disjoint —
        the property that makes a globally-sorted corpus layout prunable
        and mergeable. Pinned here because the query's manifest only
        proves the boundary math, not the writer."""
        path = str(tmp_path / "sorted")
        df = spark.createDataFrame(
            [((i * 37) % 211, i) for i in range(4000)], "k int, doc_id long"
        )
        (
            df.repartitionByRange(8, "k", "doc_id")
            .sortWithinPartitions("k", "doc_id")
            .write.mode("overwrite")
            .parquet(path)
        )
        back = spark.read.parquet(path)
        assert back.count() == 4000
        per_file = (
            back.groupBy(F.input_file_name().alias("f"))
            .agg(
                F.min(F.struct("k", "doc_id")).alias("lo"),
                F.max(F.struct("k", "doc_id")).alias("hi"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        assert len(per_file) > 1
        spans = sorted(
            ((r.lo.k, r.lo.doc_id), (r.hi.k, r.hi.doc_id)) for r in per_file
        )
        for (_, prev_hi), (nxt_lo, _) in zip(spans, spans[1:]):
            assert prev_hi < nxt_lo, (prev_hi, nxt_lo)
