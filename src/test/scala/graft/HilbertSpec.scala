package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.HilbertIndex

/** Hilbert curve index: bijectivity and the unit-step locality that makes
  * it a better clustering key than Z-order, plus the SQL surface. */
class HilbertSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // independent reference implementation (direct transcription of xy2d)
  private def ref(xIn: Long, yIn: Long, bits: Int): Long = {
    var x = xIn; var y = yIn; var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  test("hilbert_idx visits every cell of the 16x16 grid exactly once, unit steps") {
    import spark.implicits._
    val bits = 4
    val cells = (for (x <- 0 until 16; y <- 0 until 16) yield (x.toLong, y.toLong))
      .toDF("x", "y")
      .withColumn("d", HilbertIndex.hilbertIdx(col("x"), col("y"), bits))
      .collect().map(r => (r.getLong(2), (r.getLong(0), r.getLong(1))))
      .sortBy(_._1)
    // bijection onto [0, 256)
    assert(cells.map(_._1).toSeq == (0L until 256L))
    // consecutive indexes are 4-adjacent cells — the locality Z-order lacks
    cells.sliding(2).foreach { case Array((_, (x1, y1)), (_, (x2, y2))) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"non-unit step ($x1,$y1)->($x2,$y2)")
    }
  }

  test("expression matches the reference transcription on random coords, bits=10") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val pts = Seq.fill(500)((rnd.nextInt(1024).toLong, rnd.nextInt(1024).toLong))
    val got = pts.toDF("x", "y")
      .withColumn("d", HilbertIndex.hilbertIdx(col("x"), col("y"), 10))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    pts.foreach { case (x, y) => assert(got((x, y)) == ref(x, y, 10)) }
  }

  test("SQL surface hilbert_idx agrees with the Column surface") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq((3L, 5L), (1023L, 0L), (511L, 512L)).toDF("x", "y")
    df.createOrReplaceTempView("hilbert_probe")
    val viaSql = spark.sql(
      "SELECT hilbert_idx(x, y, 10) AS d FROM hilbert_probe ORDER BY d")
      .collect().map(_.getLong(0)).toSeq
    val viaCol = df.select(HilbertIndex.hilbertIdx(col("x"), col("y"), 10).as("d"))
      .orderBy("d").collect().map(_.getLong(0)).toSeq
    assert(viaSql == viaCol)
  }

  test("SQL surface accepts INT coords on BOTH eval paths (codegen + interpreted)") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    // codegen path through SQL with IntegerType inputs
    val viaSql = spark.sql("SELECT hilbert_idx(CAST(3 AS INT), CAST(5 AS INT), 10) AS d")
      .head().getLong(0)
    assert(viaSql == ref(3L, 5L, 10))
    // interpreted path: eval() the registered builder's expression directly
    // with Integer inputs — this is what threw ClassCastException before
    // the registration wrapped children in Cast(_, LongType)
    import org.apache.spark.sql.catalyst.expressions.Literal
    val built = graft.functions.GraftFunctions.specs
      .find(_._1.funcName == "hilbert_idx").get._3
      .apply(Seq(Literal(3), Literal(5), Literal(10)))
    assert(built.eval(null).asInstanceOf[Long] == ref(3L, 5L, 10))
  }

  test("zone ranges are compact: each 16k-index zone spans a bounded coordinate box") {
    import spark.implicits._
    // the property the layout buys: contiguous index ranges map to small
    // spatial boxes, so file-level min/max on (cx, cy) stays selective
    val bits = 10
    val rnd = new scala.util.Random(7)
    val pts = Seq.fill(4000)((rnd.nextInt(1024).toLong, rnd.nextInt(1024).toLong))
    val zones = pts.toDF("x", "y")
      .withColumn("zone", shiftright(
        HilbertIndex.hilbertIdx(col("x"), col("y"), bits), 14))
      .groupBy("zone")
      .agg((max("x") - min("x")).as("dx"), (max("y") - min("y")).as("dy"))
      .collect()
    // 64 zones of 16384 cells each ~ 128x128 boxes; allow generous slack
    zones.foreach { r =>
      assert(r.getLong(1) <= 256 && r.getLong(2) <= 256,
        s"zone ${r.getLong(0)} spans ${r.getLong(1)}x${r.getLong(2)}")
    }
  }
}
