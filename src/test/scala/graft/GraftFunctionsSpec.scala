package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSessionExtensions
import graft.functions.{GraftExtensions, GraftFunctions, PolyHash56}

/** SQL-surface registration of graft's custom expressions
  * (GraftExtensions / GraftFunctions.register): a config-driven job's
  * sqlQuery step must be able to call them as plain SQL functions. */
class GraftFunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sfDir

  test("registered functions evaluate from pure SQL") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT poly_hash56('abc') AS fp,
        |       dot_f32(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        |               array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS dot,
        |       cosine_f32(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |                  array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS cos_same,
        |       cosine_f32(array(CAST(0.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |                  array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS cos_zero,
        |       hamming64(5, 3) AS ham""".stripMargin).head()
    assert(r.getLong(0) == PolyHash56.hash("abc"))
    assert(r.getDouble(1) == 11.0)
    assert(r.getDouble(2) == 1.0)
    assert(r.isNullAt(3), "zero-norm cosine must be null")
    assert(r.getInt(4) == 2)
  }

  test("simhash_agg from SQL equals the Scala aggregate Column") {
    GraftFunctions.register(spark)
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(50)
    docs.createOrReplaceTempView("gf_docs")
    val viaSql = spark.sql(
      """SELECT doc_id, simhash_agg(poly_hash56(tok)) AS sh
        |FROM (SELECT doc_id, EXPLODE(SPLIT(TRIM(text), '\\s+')) AS tok FROM gf_docs)
        |GROUP BY doc_id""".stripMargin)
    val viaScala = graft.x.Dedup.simhash(docs, "text", "doc_id")
      .withColumnRenamed("simhash", "sh")
    assert(viaSql.exceptAll(viaScala).isEmpty && viaScala.exceptAll(viaSql).isEmpty)
  }

  test("frequent_items_agg: exact when vocab fits; guarantees hold under any partitioning") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.functions.FrequentItemsAgg
    // vocab fits the capacity and n < m+1 → zero error, exact counts
    val tiny = Seq("a", "a", "b", "c").toDF("item")
    val exactRows = tiny.agg(FrequentItemsAgg.frequentItems(col("item"), 10).as("sk"))
      .select(explode(col("sk")).as("e")).select("e.term", "e.count", "e.error")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(exactRows.toSeq == Seq(("a", 2L, 0L), ("b", 1L, 0L), ("c", 1L, 0L)),
      "order (count desc, term asc), exact counts, zero error")

    // skewed stream, capacity << vocab: the heavy item must survive with a
    // bracketing interval, no matter how the stream is partitioned
    val stream = spark.range(10000).select(
      when(col("id") % 3 === 0, lit("heavy"))
        .otherwise(concat(lit("t"), (col("id") % 911).cast("string"))).as("item"))
    for (parts <- Seq(1, 7, 32)) {
      val sk = stream.repartition(parts)
        .agg(FrequentItemsAgg.frequentItems(col("item"), 16).as("sk"))
        .select(explode(col("sk")).as("e")).select("e.term", "e.count", "e.error")
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(sk.contains("heavy"), s"true share 1/3 >> n/17 must survive $parts partitions")
      val (c, e) = sk("heavy")
      assert(c >= 3334L && c - e <= 3334L, s"interval must bracket the true count at $parts partitions")
      assert(sk.size <= 16, "capacity bound")
    }

    // SQL surface
    GraftFunctions.register(spark)
    stream.createOrReplaceTempView("gf_stream")
    val viaSql = spark.sql(
      "SELECT frequent_items_agg(item, 16) AS sk FROM gf_stream").head()
    assert(viaSql.getSeq[org.apache.spark.sql.Row](0).exists(_.getString(0) == "heavy"))
  }

  test("kmv_sketch_agg: set-deterministic, accurate, mergeable via re-agg; set ops exact below k") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.functions.KmvSketchAgg
    val k = 64
    val vals = spark.range(20000)
      .select(KmvSketchAgg.hash55(concat(lit("v"), col("id").cast("string"))).as("h"),
        col("id"))
    // layout invariance: the bottom-k of a SET ignores partitioning
    val one = vals.coalesce(1).agg(KmvSketchAgg.kmvSketch(col("h"), k)).head.getSeq[Long](0)
    val many = vals.repartition(13).agg(KmvSketchAgg.kmvSketch(col("h"), k)).head.getSeq[Long](0)
    assert(one == many && one.length == k && one == one.sorted)
    // estimate within the ~1/sqrt(k) KMV band for a uniform hash
    val est = vals.agg(KmvSketchAgg.kmvSketch(col("h"), k).as("sk"))
      .select(KmvSketchAgg.estimate(col("sk"), k)).head.getDouble(0)
    assert(math.abs(est - 20000.0) / 20000.0 < 0.5, s"est $est vs 20000")
    // merging stored per-batch sketches (explode + re-agg) is lossless
    val batched = vals.withColumn("b", col("id") % 4)
      .groupBy("b").agg(KmvSketchAgg.kmvSketch(col("h"), k).as("sk"))
      .select(explode(col("sk")).as("h"))
      .agg(KmvSketchAgg.kmvSketch(col("h"), k)).head.getSeq[Long](0)
    assert(batched == one, "bottom-k of bottom-k unions = bottom-k of the union")
    // below k the sketch IS the set: Jaccard and intersection go exact
    val a = spark.range(30).select(KmvSketchAgg.hash55(col("id").cast("string")).as("h"))
      .agg(KmvSketchAgg.kmvSketch(col("h"), k).as("ska"))
    val b = spark.range(10, 40).select(KmvSketchAgg.hash55(col("id").cast("string")).as("h"))
      .agg(KmvSketchAgg.kmvSketch(col("h"), k).as("skb"))
    val row = a.crossJoin(b).select(
      KmvSketchAgg.jaccard(col("ska"), col("skb"), k),
      KmvSketchAgg.intersectionEstimate(col("ska"), col("skb"), k)).head
    assert(math.abs(row.getDouble(0) - 20.0 / 40.0) < 1e-12)
    assert(math.abs(row.getDouble(1) - 20.0) < 1e-9)
    // SQL surface
    GraftFunctions.register(spark)
    vals.createOrReplaceTempView("kmv_vals")
    val viaSql = spark.sql(s"SELECT kmv_sketch_agg(h, $k) FROM kmv_vals").head.getSeq[Long](0)
    assert(viaSql == one)
  }

  test("GraftExtensions injects the same function table at session build") {
    // exercised structurally: the extension applies the identical specs
    // list injectFunction consumes (a second live session would need its
    // own context; the registry write path is shared with register())
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    assert(GraftFunctions.specs.map(_._1.funcName).toSet ==
      Set("poly_hash56", "dot_f32", "dot_i32", "sqdist_i32", "cosine_f32",
        "hamming64", "hilbert_idx", "jaro_winkler", "nfc_normalize",
        "simhash_agg", "frequent_items_agg", "kmv_sketch_agg"))
  }

  test("nfc_normalize: composes combining marks, identity on NFC input, " +
    "codegen = interpreted, null-safe") {
    import spark.implicits._
    val dec = "café naïve"   // e + U+0301, i + U+0308
    val pre = "café naïve"     // precomposed é, ï
    val df = Seq((dec, pre), ("plain ascii", "plain ascii"),
      (null.asInstanceOf[String], "x")).toDF("a", "b")
    graft.functions.GraftFunctions.register(spark)
    val rows = df.selectExpr("nfc_normalize(a) AS na", "nfc_normalize(b) AS nb")
      .collect()
    assert(rows(0).getString(0) == pre && rows(0).getString(1) == pre,
      "decomposed input must compose to the precomposed form")
    assert(rows(1).getString(0) == "plain ascii")
    assert(rows(2).isNullAt(0) && rows(2).getString(1) == "x")
    // interpreted fallback agrees with codegen
    import org.apache.spark.unsafe.types.UTF8String
    assert(graft.functions.NfcNormalizeExpr
      .nfc(UTF8String.fromString(dec)).toString == pre)
    // already-NFC fast path returns the same object (no re-allocation)
    val s = UTF8String.fromString("abc")
    assert(graft.functions.NfcNormalizeExpr.nfc(s) eq s)
  }

  test("jaro_winkler: textbook values, DuckDB conventions, codegen = interpreted") {
    import spark.implicits._
    GraftFunctions.register(spark)
    // textbook pairs (Winkler 1990) + the conventions verified against
    // DuckDB: empty → 0, boost only above jaro 0.7, prefix capped at 4
    val cases = Seq(
      ("MARTHA", "MARHTA", 0.9611111111111111),
      ("DIXON", "DICKSONX", 0.8133333333333332),
      ("JELLYFISH", "SMELLYFISH", 0.8962962962962964),
      ("DWAYNE", "DUANE", 0.8400000000000001),
      ("CRATE", "TRACE", 0.7333333333333334),
      ("abcdxxxxxx", "abcdyyyyyyyyyyyy", 0.5499999999999999), // prefix, jaro<=0.7: no boost
      ("apple", "apple", 1.0),
      ("abc", "", 0.0), ("", "", 0.0), ("a", "b", 0.0))
    cases.foreach { case (a, b, want) =>
      assert(graft.functions.JaroWinklerExpr.compute(a, b) == want, s"($a,$b)")
    }
    // SQL surface, codegen path, equals the direct computation
    val got = cases.toDF("a", "b", "want")
      .selectExpr("jaro_winkler(a, b) AS jw", "want")
      .as[(Double, Double)].collect()
    got.foreach { case (jw, want) => assert(jw == want) }
  }

  test("custom scalar functions stay inside whole-stage codegen") {
    GraftFunctions.register(spark)
    spark.read.parquet(s"$sf/embeddings.parquet").createOrReplaceTempView("gf_emb")
    val plan = spark.sql(
      "SELECT vec_id, dot_f32(embedding, embedding) AS d FROM gf_emb")
      .queryExecution.executedPlan.toString
    // the `*(n)` prefix marks operators fused into WholeStageCodegen
    assert(plan.contains("*(1) Project"), s"expected codegen'd Project in:\n$plan")
  }

  test("dot_i32 / sqdist_i32: bit-identical to the HOF forms they replace, " +
    "codegen = interpreted, null-safe") {
    import org.apache.spark.sql.functions._
    GraftFunctions.register(spark)
    // int8 codes of the real fixture + adversarial rows: zero vector,
    // extreme codes, a null vector (expression null semantics)
    val emb = spark.read.parquet(s"$sf/embeddings.parquet").limit(200)
      .select(col("vec_id"), graft.x.Similarity.int8Codes(col("embedding")).as("c"))
    import spark.implicits._
    val edges = Seq(
      (100001L, Some(Array.fill(64)(0))),
      (100002L, Some(Array.fill(64)(127))),
      (100003L, Some(Array.fill(64)(-127))),
      (100004L, Option.empty[Array[Int]])
    ).toDF("vec_id", "c")
    emb.unionByName(edges).createOrReplaceTempView("gf_codes0")
    // + a null LANE (int8Codes maps a null float element to one) and a
    // MISMATCHED length — the two classes where the HOF returns NULL and
    // a naive fused loop would return a finite wrong number
    spark.sql(
      """SELECT vec_id, c FROM gf_codes0
        |UNION ALL SELECT 100005L, array(1, CAST(NULL AS INT), 3)
        |UNION ALL SELECT 100006L, array(1, 2, 3)""".stripMargin)
      .createOrReplaceTempView("gf_codes")
    val both = spark.sql(
      """SELECT a.vec_id AS ia, b.vec_id AS ib,
        |  dot_i32(a.c, b.c) AS fused_dot,
        |  AGGREGATE(ZIP_WITH(a.c, b.c, (x, y) -> CAST(x AS BIGINT) * CAST(y AS BIGINT)),
        |            CAST(0 AS BIGINT), (acc, v) -> acc + v) AS hof_dot,
        |  sqdist_i32(a.c, b.c) AS fused_d2,
        |  AGGREGATE(ZIP_WITH(a.c, b.c,
        |              (x, y) -> (CAST(x AS BIGINT) - CAST(y AS BIGINT)) *
        |                        (CAST(x AS BIGINT) - CAST(y AS BIGINT))),
        |            CAST(0 AS BIGINT), (acc, v) -> acc + v) AS hof_d2
        |FROM gf_codes a JOIN gf_codes b ON a.vec_id < b.vec_id""".stripMargin)
    val bad = both.filter(
      !(col("fused_dot") <=> col("hof_dot")) ||
      !(col("fused_d2") <=> col("hof_d2")))
    assert(bad.isEmpty, s"fused != HOF on:\n${bad.limit(5).collect().mkString("\n")}")
    // null vector, null lane, and mismatched length → null on every
    // pairing (the HOF contract, now replicated by the fused loops);
    // the length-3 row still dots finitely against ITSELF-length peers
    assert(both.filter(col("ib").isin(100004L, 100005L))
      .filter(col("fused_dot").isNotNull || col("fused_d2").isNotNull).isEmpty)
    assert(both.filter(col("ib") === 100006L && col("ia") < 100005L)
      .filter(col("fused_dot").isNotNull).isEmpty,
      "mismatched lengths must null, not truncate")
    assert(both.filter(col("ia") === 100005L && col("ib") === 100006L)
      .count() == 1)
    // interpreted path (no codegen) agrees — direct expression eval
    assert(graft.functions.DotProductInt(
      org.apache.spark.sql.catalyst.expressions.Literal.create(Array(1, -2, 3),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.IntegerType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(Array(4, 5, -6),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.IntegerType)))
      .eval(null) == (4 - 10 - 18).toLong)
    assert(graft.functions.SqDistInt(
      org.apache.spark.sql.catalyst.expressions.Literal.create(Array(1, -2, 3),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.IntegerType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(Array(4, 5, -6),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.IntegerType)))
      .eval(null) == (9 + 49 + 81).toLong)
  }

  test("type-punned array expressions reject wrong element types at analysis") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{array, col, lit}
    // NGramPolyHash reads lanes via getUTF8String: a long array's slots
    // would parse as string offset/size pairs — must be an analysis error
    val longs = Seq(Seq(1L, 2L)).toDF("toks")
    val e1 = intercept[org.apache.spark.sql.AnalysisException] {
      longs.select(graft.functions.NGramPolyHash(col("toks"), 2)).collect()
    }
    assert(e1.getMessage.contains("ngram_poly_hash56 expects"), e1.getMessage)
    // HllRegsMaxAgg reads lanes via getByte: wider slots read punned
    val ints = Seq(Seq(1, 2)).toDF("regs")
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      ints.agg(graft.functions.HllRegsMaxAgg.regsMax(col("regs"), 2)).collect()
    }
    assert(e2.getMessage.contains("hll_regs_max_agg expects"), e2.getMessage)
    // the blessed types still pass
    assert(Seq(Seq("a", "b")).toDF("toks")
      .select(graft.functions.NGramPolyHash(col("toks"), 2)).count() == 1)
  }
}
