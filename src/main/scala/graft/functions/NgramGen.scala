package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `ngrams_gen(text, n)` — generator (UDTF surface, SURVEY §2.10):
  * streams one row per word n-gram of a text column.
  *
  * The composition alternative (`explode(transform(split(...), ...))`)
  * MATERIALIZES every document's full n-gram array before the explode
  * — for a 100k-token document that is a ~100k-element array held
  * live per row, and the interpreted higher-order `transform` lambda
  * breaks whole-stage codegen around it. A Generator yields rows
  * lazily through GenerateExec: per-row memory is one token array,
  * and nothing n-gram-sized is ever allocated at once.
  *
  * Token convention: split on runs of whitespace, empty tokens
  * dropped; documents with fewer than n tokens generate nothing.
  * Deterministic, null-safe (null text → no rows).
  */
case class NgramGen(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _ if n < 1 || n > 16 => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires 1 <= n <= 16, got $n")
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got $other")
  }

  override def elementSchema: StructType =
    new StructType().add("gram", StringType, nullable = false)

  override def prettyName: String = "ngrams_gen"

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val s = child.eval(input).asInstanceOf[UTF8String]
    if (s == null) return Iterator.empty
    val toks = s.toString.split("\\s+").filter(_.nonEmpty)
    if (toks.length < n) Iterator.empty
    else (0 to toks.length - n).iterator.map { i =>
      InternalRow(UTF8String.fromString(toks.slice(i, i + n).mkString(" ")))
    }
  }

  override protected def withNewChildInternal(newChild: Expression): NgramGen =
    copy(child = newChild)
}
