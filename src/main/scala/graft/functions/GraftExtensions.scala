package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BitwiseCount, BitwiseXor, Cast, Divide, EqualTo, Expression, ExpressionInfo, If, Literal, Multiply, Sqrt}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DoubleType, LongType}

/** SQL-surface registration for graft's custom Catalyst expressions.
  *
  * The reference's ONLY query interface is SQL text in the config's
  * transformation phase (`/root/reference/spark.json:57`), so custom
  * functions that exist only as Scala `Column` helpers would be invisible
  * to a config-driven job. Registering them as native SQL functions closes
  * that gap: a `sqlQuery` step can call `poly_hash56(text)` or
  * `cosine_f32(a, b)` directly, and the expressions stay codegen'd
  * Catalyst nodes (no UDF boundary) inside whole-stage codegen.
  *
  * Two entry points, same function table:
  *  - `spark.sql.extensions=graft.functions.GraftExtensions` at session
  *    build time (the idiomatic Spark library hook), or
  *  - [[GraftFunctions.register]] on a live session (what
  *    [[graft.run.Orchestrator]] does, since it receives the session).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.specs.foreach(ext.injectFunction)
}

object GraftFunctions {

  // the 2-arg constructor skips the group/since/source validation the full
  // constructor applies to built-in docs metadata we don't need
  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, name)

  private def arity(name: String, n: Int, es: Seq[Expression]): Unit =
    require(es.length == n, s"$name expects $n arguments, got ${es.length}")

  // builders must return plain catalyst Expression trees (a Column-DSL
  // composition would smuggle in opaque ColumnNode wrappers the analyzer
  // doesn't resolve inside a function builder)
  /** (identifier, catalog info, builder) triples — the exact shape
    * `SparkSessionExtensions.injectFunction` takes. */
  val specs: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("poly_hash56"),
      info("poly_hash56", "poly_hash56(str) - portable 55-bit polynomial hash (oracle-replayable)"),
      es => { arity("poly_hash56", 1, es); PolyHash56(es.head) }),

    (FunctionIdentifier("dot_f32"),
      info("dot_f32", "dot_f32(array<float>, array<float>) - codegen'd dot product"),
      es => { arity("dot_f32", 2, es); DotProductFloat(es.head, es(1)) }),

    (FunctionIdentifier("dot_i32"),
      info("dot_i32", "dot_i32(array<int>, array<int>) - exact BIGINT dot product (int8-code tier)"),
      es => { arity("dot_i32", 2, es); DotProductInt(es.head, es(1)) }),

    (FunctionIdentifier("sqdist_i32"),
      info("sqdist_i32", "sqdist_i32(array<int>, array<int>) - exact BIGINT squared L2 (int8-code tier)"),
      es => { arity("sqdist_i32", 2, es); SqDistInt(es.head, es(1)) }),

    // same zero-norm-→-null contract as VectorFunctions.cosineSimilarity
    (FunctionIdentifier("cosine_f32"),
      info("cosine_f32", "cosine_f32(array<float>, array<float>) - cosine similarity (null on zero norm)"),
      es => { arity("cosine_f32", 2, es)
        val denom = Multiply(Sqrt(DotProductFloat(es.head, es.head)),
          Sqrt(DotProductFloat(es(1), es(1))))
        If(EqualTo(denom, Literal(0.0)), Literal.create(null, DoubleType),
          Divide(DotProductFloat(es.head, es(1)), denom)) }),

    // children cast to LongType explicitly: HilbertIndex.nullSafeEval
    // unboxes Long, so an un-cast IntegerType input would work under
    // codegen (Java int widens) yet ClassCastException on the interpreted
    // fallback — the Cast makes both eval paths identical
    (FunctionIdentifier("hilbert_idx"),
      info("hilbert_idx",
        "hilbert_idx(x, y, bits) - Hilbert curve index of a 2-D cell (layout clustering)"),
      es => { arity("hilbert_idx", 3, es)
        require(es(2).foldable, "hilbert_idx bits must be a literal")
        HilbertIndex(Cast(es.head, LongType), Cast(es(1), LongType),
          es(2).eval().asInstanceOf[Number].intValue) }),

    (FunctionIdentifier("hamming64"),
      info("hamming64", "hamming64(bigint, bigint) - Hamming distance between 64-bit signatures"),
      es => { arity("hamming64", 2, es); BitwiseCount(BitwiseXor(es.head, es(1))) }),

    (FunctionIdentifier("jaro_winkler"),
      info("jaro_winkler",
        "jaro_winkler(str, str) - Jaro-Winkler similarity (record-linkage comparator)"),
      es => { arity("jaro_winkler", 2, es); JaroWinklerExpr(es.head, es(1)) }),

    (FunctionIdentifier("nfc_normalize"),
      info("nfc_normalize",
        "nfc_normalize(str) - Unicode NFC canonical composition (pre-hash text canonicalization)"),
      es => { arity("nfc_normalize", 1, es); NfcNormalizeExpr(es.head) }),

    // aggregate: the analyzer wraps a returned AggregateFunction in the
    // AggregateExpression itself, so the builder returns the bare function
    (FunctionIdentifier("simhash_agg"),
      info("simhash_agg", "simhash_agg(token_hash) - 64-bit SimHash signature of the group"),
      es => { arity("simhash_agg", 1, es); SimHashAgg(es.head) }),

    (FunctionIdentifier("frequent_items_agg"),
      info("frequent_items_agg",
        "frequent_items_agg(item, m) - m-counter Misra-Gries heavy-hitter summary"),
      es => { arity("frequent_items_agg", 2, es)
        require(es(1).foldable, "frequent_items_agg capacity must be a literal")
        FrequentItemsAgg(es.head, es(1).eval().asInstanceOf[Number].intValue) }),

    (FunctionIdentifier("kmv_sketch_agg"),
      info("kmv_sketch_agg",
        "kmv_sketch_agg(hash55, k) - k-minimum-values theta sketch (sorted array<bigint>)"),
      es => { arity("kmv_sketch_agg", 2, es)
        require(es(1).foldable, "kmv_sketch_agg k must be a literal")
        KmvSketchAgg(es.head, es(1).eval().asInstanceOf[Number].intValue) })
  )

  /** Register every graft function into a live session (idempotent — a
    * re-registration overwrites with the same builder). */
  def register(spark: SparkSession): Unit =
    specs.foreach { case (ident, fnInfo, builder) =>
      ColumnBridge.registerFunction(spark, ident, fnInfo, builder)
    }
}
