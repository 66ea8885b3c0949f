package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._

/** Contract check against the driver-generated fixtures (FIXTURES.md).
  *
  * Round 5 was lost because the driver silently regenerated `events.ts`
  * from TIMESTAMP(NANOS) to TIMESTAMP(MICROS) and every query died with an
  * unreadable analysis error deep inside `reg()`. This spec turns the next
  * silent regeneration into ONE message naming the drifted table.column.
  *
  * `events.ts` is intentionally polymorphic: any of long (nanosAsLong),
  * timestamp_ntz, or timestamp is accepted raw, and
  * [[graft.sources.SourceReader.readEvents]] must normalize all three to
  * session-TZ TimestampType.
  */
class FixtureContractSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sfDir

  // Timestamp-ish columns the fixtures have shipped in multiple parquet
  // encodings across driver builds; accept any, queries cast as needed.
  private val tsLike: Set[DataType] =
    Set(TimestampType, TimestampNTZType, LongType)

  private def expected: Map[String, Seq[(String, DataType => Boolean)]] = {
    def is(dt: DataType): DataType => Boolean = _ == dt
    Map(
      "region" -> Seq("r_regionkey" -> is(IntegerType), "r_name" -> is(StringType)),
      "nation" -> Seq("n_nationkey" -> is(IntegerType), "n_name" -> is(StringType),
        "n_regionkey" -> is(IntegerType)),
      "customer" -> Seq("c_custkey" -> is(LongType), "c_name" -> is(StringType),
        "c_nationkey" -> is(IntegerType), "c_acctbal" -> is(DoubleType),
        "c_mktsegment" -> is(StringType)),
      "supplier" -> Seq("s_suppkey" -> is(LongType), "s_name" -> is(StringType),
        "s_nationkey" -> is(IntegerType), "s_acctbal" -> is(DoubleType)),
      "part" -> Seq("p_partkey" -> is(LongType), "p_name" -> is(StringType),
        "p_brand" -> is(StringType), "p_type" -> is(StringType),
        "p_size" -> is(IntegerType), "p_retailprice" -> is(DoubleType)),
      "orders" -> Seq("o_orderkey" -> is(LongType), "o_custkey" -> is(LongType),
        "o_orderstatus" -> is(StringType), "o_totalprice" -> is(DoubleType),
        "o_orderdate" -> tsLike.contains _, "o_orderpriority" -> is(StringType)),
      "lineitem" -> Seq("l_orderkey" -> is(LongType), "l_partkey" -> is(LongType),
        "l_suppkey" -> is(LongType), "l_linenumber" -> is(IntegerType),
        "l_quantity" -> is(DoubleType), "l_extendedprice" -> is(DoubleType),
        "l_discount" -> is(DoubleType), "l_tax" -> is(DoubleType),
        "l_returnflag" -> is(StringType), "l_linestatus" -> is(StringType),
        "l_shipdate" -> tsLike.contains _),
      "events" -> Seq("event_id" -> is(LongType), "ts" -> tsLike.contains _,
        "user_id" -> is(LongType), "event_type" -> is(StringType),
        "value" -> is(DoubleType), "props" -> is(StringType)),
      "documents" -> Seq("doc_id" -> is(LongType), "text" -> is(StringType),
        "lang" -> is(StringType), "source" -> is(StringType),
        "n_chars" -> is(LongType)),
      "embeddings" -> Seq("vec_id" -> is(LongType),
        "embedding" -> ((dt: DataType) => dt match {
          case ArrayType(FloatType, _) => true; case _ => false
        }),
        "label" -> is(IntegerType))
    )
  }

  test("every fixture table matches the FIXTURES.md schema contract") {
    // nanosAsLong so a NANOS-era events file is readable for inspection
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val drift = expected.toSeq.sortBy(_._1).flatMap { case (table, cols) =>
      val path = s"$sf/$table.parquet"
      if (!new java.io.File(path).exists()) Seq(s"$table: fixture file missing at $path")
      else {
        val schema = spark.read.parquet(path).schema
        val nameDrift =
          if (schema.fieldNames.toSeq == cols.map(_._1))
            Seq.empty
          else Seq(s"$table: columns are ${schema.fieldNames.mkString("[", ", ", "]")}" +
            s", contract says ${cols.map(_._1).mkString("[", ", ", "]")}")
        val typeDrift = cols.flatMap { case (name, ok) =>
          schema.find(_.name == name) match {
            case Some(f) if ok(f.dataType) => None
            case Some(f) => Some(s"$table.$name: parquet reads as ${f.dataType.sql}" +
              ", not an accepted encoding (see FIXTURES.md)")
            case None => None // already covered by nameDrift
          }
        }
        nameDrift ++ typeDrift
      }
    }
    assert(drift.isEmpty,
      s"\nFIXTURE DRIFT — the driver regenerated testdata under the repo:\n - " +
        drift.mkString("\n - ") +
        "\nFix the adaptive seam (SourceReader.readEvents / this contract), " +
        "do NOT hard-code the new encoding at call sites.")
  }

  test("events.props is exactly a single-key integer JSON object") {
    // The x136_variant_json DuckDB oracle reconstructs the canonical
    // `normalized` form as CONCAT('{"k":', CAST(... AS ...), '}'), which is
    // correct ONLY while every props value is a one-key integer object
    // {"k": <int>}. The Spark side canonicalizes for real (to_json ∘
    // parse_json), so a driver regeneration that adds keys or non-integer
    // values would break the ORACLE, not the implementation — pin the
    // shape here so that drift fails with a named message instead of an
    // unexplained x136 hash mismatch.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val props = spark.read.parquet(s"$sf/events.parquet").select("props")
    val offenders = props
      .filter(!org.apache.spark.sql.functions.col("props")
        .rlike("""^\{"k": -?\d+\}$"""))
      .limit(5).collect().map(_.getString(0))
    assert(offenders.isEmpty,
      s"""\nFIXTURE DRIFT — events.props no longer matches {"k": <int>}:\n - """ +
        offenders.mkString("\n - ") +
        "\nUpdate the x136_variant_json oracle's CONCAT reconstruction " +
        "(SparkEntry.oracleSql) to the new props shape — the Spark side " +
        "(to_json ∘ parse_json) is already shape-agnostic.")
  }

  test("readEvents normalizes ts to session-TZ TimestampType with micros intact") {
    val ev = graft.sources.SourceReader.readEvents(spark, s"$sf/events.parquet")
    assert(ev.schema("ts").dataType == TimestampType,
      s"readEvents must yield TimestampType ts, got ${ev.schema("ts").dataType.sql}")
    // UTC session: the normalized instant must round-trip the raw micros
    val got = ev.selectExpr("min(unix_micros(ts))").head().getLong(0)
    val raw = spark.read.parquet(s"$sf/events.parquet")
    val want = raw.schema("ts").dataType match {
      case LongType => raw.selectExpr("min(ts div 1000)").head().getLong(0)
      case _ => raw.selectExpr("min(unix_micros(cast(ts as timestamp)))").head().getLong(0)
    }
    assert(got == want, s"ts instant shifted in normalization: $got != $want")
    assert(ev.count() == raw.count())
  }
}
