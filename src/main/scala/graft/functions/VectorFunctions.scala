package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over embedding columns (ArrayType(FloatType), dim 64 in the
  * fixtures — FIXTURES.md) built ONLY from codegen'd higher-order functions
  * (`zip_with`, `aggregate`), no Scala UDFs, so the hot path stays inside
  * whole-stage codegen (SURVEY.md §2.9 X3; the udf→Expression promotion
  * path in §4 stays open but the built-in HOFs already avoid the UDF
  * serialization boundary).
  *
  * Determinism: every fold is a per-row left-to-right double accumulation —
  * same IEEE result on every engine that folds in order (the DuckDB oracle
  * does), which is what makes cosine results hash-comparable.
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ in double precision, in array order, over float vectors.
    * Backed by the codegen'd [[DotProductFloat]] expression (same
    * left-to-right fold as the higher-order-function form it replaced, so
    * results are bit-identical — see DotProductExpr.scala for the
    * promotion rationale). */
  def dotProduct(a: Column, b: Column): Column = DotProductFloat.dot(a, b)

  /** The pre-promotion composed-HOF form, kept as the reference
    * implementation (works on any numeric array type). */
  def dotProductHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v
    )

  /** ‖a‖₂ */
  def l2Norm(a: Column): Column = sqrt(dotProduct(a, a))

  /** cos(a,b) = a·b / (‖a‖‖b‖); null-safe on zero vectors (returns null
    * rather than ±Infinity so downstream filters drop them). */
  def cosineSimilarity(a: Column, b: Column): Column = {
    val denom = l2Norm(a) * l2Norm(b)
    when(denom === 0.0, lit(null).cast("double")).otherwise(dotProduct(a, b) / denom)
  }

  def euclideanDistance(a: Column, b: Column): Column =
    sqrt(aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double"); d * d
      }),
      lit(0.0),
      (acc, v) => acc + v
    ))

  /** Symmetric int8 quantization of a float vector: q_i = round(v_i·127/amax)
    * with amax = max|v_i| (the classic storage/bandwidth trade for
    * embedding corpora — 4× smaller vectors, dequantize via q·amax/127).
    * Returns (array<int>, amax). Zero vectors quantize to zeros. */
  def quantizeInt8(vec: Column): (Column, Column) = {
    val amax = array_max(transform(vec, x => abs(x.cast("double"))))
    val q = transform(vec, x =>
      when(amax === 0.0, lit(0))
        .otherwise(round(x.cast("double") * 127.0 / amax).cast("int")))
    (q, amax)
  }

  /** Random-hyperplane LSH signature: sign bit of a·hᵢ for `planes`
    * deterministic pseudo-random hyperplanes (seeded; same signature on
    * every run/executor). Used to bucket vectors so near-neighbor search
    * joins within buckets instead of the full cross product (§2.9 X3 scale
    * path). Pure built-in expressions — `typedlit` hyperplanes are plan
    * constants, broadcast with the plan itself. */
  def hyperplaneSignature(vec: Column, dim: Int, planes: Int, seed: Long = 42L): Column =
    concat(signatureBits(vec, dim, planes, seed): _*)

  /** Multi-probe signature set: the vector's own signature plus every
    * 1-bit flip of it — the standard recall lever for hyperplane LSH at a
    * FIXED bucket granularity. A near neighbor that lands one narrow
    * hyperplane margin away (the dominant miss mode: the query sat close
    * to one plane) is found in a flipped bucket, so recall rises without
    * coarsening `planes` (which would inflate every bucket). The probes
    * are pairwise distinct, so a corpus row still joins each query at most
    * once. Returns `planes + 1` signatures; probe cost scales the SMALL
    * (query) side only. */
  def hyperplaneProbes(vec: Column, dim: Int, planes: Int, seed: Long = 42L): Column = {
    val bits = signatureBits(vec, dim, planes, seed)
    val flip = (b: Column) => when(b === "1", lit("0")).otherwise(lit("1"))
    val flipped = bits.indices.map { i =>
      concat(bits.zipWithIndex.map { case (b, j) =>
        if (j == i) flip(b) else b }: _*)
    }
    array(concat(bits: _*) +: flipped: _*)
  }

  private def signatureBits(vec: Column, dim: Int, planes: Int, seed: Long): Seq[Column] = {
    val rnd = new scala.util.Random(seed)
    val hs: Seq[Seq[Float]] = // float planes: DotProductFloat operates on float arrays
      Seq.fill(planes)(Seq.fill(dim)(rnd.nextGaussian().toFloat))
    hs.map { h =>
      when(dotProduct(vec, typedlit(h)) > 0.0, lit("1")).otherwise(lit("0"))
    }
  }
}
