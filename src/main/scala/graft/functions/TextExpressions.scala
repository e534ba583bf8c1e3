package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization as a native codegen expression — the
  * curation verb every real corpus pipeline runs before hashing or
  * deduplicating text (the SAME logical text arrives in composed and
  * decomposed forms — `é` as U+00E9 vs `e`+U+0301 — and byte-level
  * dedup/fingerprints treat them as different documents unless the
  * corpus is normalized first).
  *
  * Spark ships no normalizer, and a Scala UDF would break codegen on
  * the text hot path, so this follows the [[VectorExpressions]]
  * pattern: a Catalyst `UnaryExpression` with `doGenCode`, living
  * inside whole-stage codegen. The JDK's `java.text.Normalizer` does
  * the Unicode work (identical tables everywhere the JVM runs).
  *
  * Fast path: ASCII bytes are invariant under every normalization
  * form, and `UTF8String.isFullAscii()` is a cheap byte scan — the
  * overwhelmingly common all-ASCII row passes through with ZERO
  * String allocation. Non-ASCII rows check `isNormalized` before
  * allocating the normalized copy.
  *
  * `form` is `NFC` (canonical composition — what DuckDB's
  * `nfc_normalize` implements, hence the oracle twin) or `NFKC`
  * (compatibility composition — folds ligatures/fullwidth/etc., the
  * usual LLM-corpus choice; no DuckDB twin exists so its gate is
  * spec-level against known vectors).
  */
case class NormalizeText(child: Expression, form: String)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = s"graft_${form.toLowerCase}"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got " +
        child.dataType.catalogString)

  override def nullSafeEval(s: Any): Any =
    NormalizeText.normalize(s.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"""${ev.value} = graft.functions.NormalizeText.normalize($s, "$form");""")

  override protected def withNewChildInternal(newChild: Expression)
      : NormalizeText = copy(child = newChild)
}

object NormalizeText {

  import org.apache.spark.sql.{Column, GraftColumnBridge}

  /** Column API (DataFrame path; SQL path registers via
    * [[graft.GraftExtensions]]).
    */
  def nfc(c: Column): Column = GraftColumnBridge.column(
    NormalizeText(GraftColumnBridge.expression(c), "NFC"))
  def nfkc(c: Column): Column = GraftColumnBridge.column(
    NormalizeText(GraftColumnBridge.expression(c), "NFKC"))

  /** Shared by interpreted eval and generated code (the JDK call is
    * the whole body — generating the branches inline would only
    * duplicate this method into every compiled stage).
    */
  def normalize(u: UTF8String, form: String): UTF8String = {
    if (u.isFullAscii) return u
    val f = Normalizer.Form.valueOf(form)
    val js = u.toString
    if (Normalizer.isNormalized(js, f)) u
    else UTF8String.fromString(Normalizer.normalize(js, f))
  }

  private def descriptor(name: String, form: String)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo(classOf[NormalizeText].getName, name),
      children => {
        if (children.length != 1)
          throw new IllegalArgumentException(
            s"$name requires exactly 1 argument, got ${children.length}")
        NormalizeText(children.head, form)
      })

  /** injectFunction descriptors for [[graft.GraftExtensions]]. */
  val nfcDescriptor: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = descriptor("graft_nfc", "NFC")
  val nfkcDescriptor: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = descriptor("graft_nfkc", "NFKC")
}
