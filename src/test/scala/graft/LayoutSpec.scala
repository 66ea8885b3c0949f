package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.x.Layout

/** Z-order layout operator: bit interleave correctness + the clustering
  * property the layout exists for. */
class LayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("zValue interleaves bits (known values, full small grid)") {
    val known = Seq((0L, 0L, 0L), (1L, 0L, 1L), (0L, 1L, 2L), (1L, 1L, 3L),
      (2L, 3L, 14L), (3L, 3L, 15L))
    val got = known.map { case (x, y, _) => (x, y) }.toDF("x", "y")
      .select(Layout.zValue($"x", $"y", 4).as("z")).as[Long].collect()
    assert(got.toSeq == known.map(_._3))
    // a 4x4 grid maps bijectively onto z ∈ 0..15
    val grid = (for (x <- 0L until 4L; y <- 0L until 4L) yield (x, y)).toDF("x", "y")
    val zs = grid.select(Layout.zValue($"x", $"y", 2).as("z")).as[Long].collect().sorted
    assert(zs.toSeq == (0L until 16L))
  }

  test("cell quantizes with clamping at fixed domain bounds") {
    val df = Seq(-5.0, 0.0, 50.0, 100.0, 250.0).toDF("v")
    val got = df.select(Layout.cell($"v", 0.0, 100.0, 2).as("c")).as[Long].collect()
    // n = 3: -5→clamp 0, 0→0, 50→1 (floor 1.5), 100→3, 250→clamp 3
    assert(got.toSeq == Seq(0L, 0L, 1L, 3L, 3L))
  }

  test("zOrder clusters both dimensions (tight per-partition boxes)") {
    val n = 4096
    val pts = (0 until n).map { i => (i.toLong % 64, (i * 2654435761L % 64)) }
      .toDF("xc", "yc")
    val z = Layout.zOrder(pts, $"xc", $"yc", bits = 6)
    // within each curve segment of 64 codes, both coordinates span ≤ a
    // 8x8 box (property of Morton order: 64 consecutive codes sit inside
    // an aligned 8x8 tile) — the unsorted layout spans the full 64x64
    val seg = z.groupBy((col("z") / 64).cast("long").as("s"))
      .agg((max("xc") - min("xc")).as("dx"), (max("yc") - min("yc")).as("dy"))
    val bad = seg.filter(col("dx") > 7 || col("dy") > 7).count()
    assert(bad == 0, s"$bad curve segments exceeded their 8x8 tile")
  }
}
