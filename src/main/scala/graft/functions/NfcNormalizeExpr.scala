package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd Unicode NFC normalization (UAX #15 canonical composition) —
  * the text-canonicalization step every hash-keyed dedup/decontamination
  * path needs BEFORE fingerprinting: `café` typed as `e` + COMBINING
  * ACUTE (U+0065 U+0301) and as precomposed `é` (U+00E9) are byte-
  * DIFFERENT UTF-8, so exact dedup, shingle hashes, MinHash bands and
  * URL keys all silently treat canonical duplicates as distinct until
  * the text is normalized. Web-crawl corpora mix both forms freely
  * (editors and OSes differ in what they emit).
  *
  * Spark ships no normalization function; a Scala UDF would box every
  * string out of Tungsten in the hottest pre-hash path. This is a
  * Catalyst `UnaryExpression` whose generated code is one static call on
  * the raw `UTF8String`, staying inside whole-stage codegen — with a
  * zero-allocation fast path: `Normalizer.isNormalized` is true for the
  * overwhelmingly common already-NFC (e.g. pure-ASCII) case, and then
  * the INPUT object is returned untouched.
  *
  * Oracle-replayable against DuckDB's `nfc_normalize` — both implement
  * UAX #15 NFC (ICU there, `java.text.Normalizer` here); canonical
  * composition is stable for assigned codepoints across the Unicode
  * versions involved. NFC (not NFKC) is deliberate: compatibility
  * mappings (ﬁ → fi, ² → 2) are lossy content EDITS a dedup key should
  * opt into explicitly, while canonical composition is representation-
  * only and always safe.
  */
case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(s: Any): Any =
    NfcNormalizeExpr.nfc(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NfcNormalizeExpr.nfc($c);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object NfcNormalizeExpr {

  /** Entry point shared by interpreted eval and generated code. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** Column-level entry point. */
  def normalize(c: Column): Column =
    ColumnBridge.column(NfcNormalizeExpr(ColumnBridge.expression(c)))
}
