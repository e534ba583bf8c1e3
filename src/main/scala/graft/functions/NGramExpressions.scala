package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native word n-gram generator for the shingle hot path.
  *
  * The HOF formulation — `transform(sequence(1, size-2), i ->
  * concat_ws(' ', element_at(toks, i), ...))` — evaluates an
  * interpreted lambda per shingle with three boxed element lookups
  * and builds an index array per row. This expression emits one tight
  * loop producing the same strings: for tokens t_0..t_{m-1} and
  * n-gram width n, output m-n+1 strings `t_i ⧺ ' ' ⧺ … ⧺ t_{i+n-1}`
  * (fewer than n tokens → empty array, matching the HOF guard).
  * Null token elements are skipped by the separator join, exactly as
  * `concat_ws` does.
  */
case class WordNGrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"n-gram width must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_ngrams"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string>, got ${other.catalogString}")
    }

  private val sep = UTF8String.fromString(" ")

  override def nullSafeEval(a: Any): Any = {
    val toks = a.asInstanceOf[ArrayData]
    val m = toks.numElements()
    if (m < n) new GenericArrayData(Array.empty[Any])
    else {
      val out = new Array[Any](m - n + 1)
      var i = 0
      while (i <= m - n) {
        val parts = new Array[UTF8String](n)
        var j = 0
        while (j < n) {
          parts(j) = if (toks.isNullAt(i + j)) null
                     else toks.getUTF8String(i + j)
          j += 1
        }
        out(i) = UTF8String.concatWs(sep, parts: _*)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val out = ctx.freshName("out")
      val parts = ctx.freshName("parts")
      val sepRef = ctx.addReferenceObj("sep", sep,
        classOf[UTF8String].getName)
      val utf8 = classOf[UTF8String].getName
      val gad = classOf[GenericArrayData].getName
      s"""
         |final int $m = $a.numElements();
         |if ($m < $n) {
         |  ${ev.value} = new $gad(new Object[0]);
         |} else {
         |  Object[] $out = new Object[$m - $n + 1];
         |  for (int $i = 0; $i <= $m - $n; $i++) {
         |    $utf8[] $parts = new $utf8[$n];
         |    for (int $j = 0; $j < $n; $j++) {
         |      $parts[$j] = $a.isNullAt($i + $j)
         |        ? null : $a.getUTF8String($i + $j);
         |    }
         |    $out[$i] = $utf8.concatWs($sepRef, $parts);
         |  }
         |  ${ev.value} = new $gad($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WordNGrams =
    copy(child = newChild)
}

object NGramExpressions {
  /** injectFunction descriptor: graft_ngrams(tokens, n) with a
    * foldable integer width.
    */
  val ngramsDescriptor: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_ngrams"),
      new ExpressionInfo(classOf[WordNGrams].getName, "graft_ngrams"),
      (children: Seq[Expression]) => {
        if (children.length != 2)
          throw new IllegalArgumentException(
            s"graft_ngrams requires exactly 2 arguments, got ${children.length}")
        children(1) match {
          case Literal(v: Int, IntegerType) => WordNGrams(children.head, v)
          case other => throw new IllegalArgumentException(
            s"graft_ngrams width must be an integer literal, got $other")
        }
      })
}
