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

/** `ngram_hash_pos(toks, n)` — generator: one (pos, fp) row per
  * n-token window of a token-array column, in order. fp is the
  * order-sensitive XXH64 chain over per-token hashes (each token
  * hashed ONCE, then n chained long-hash ops per window — the
  * NgramHashes composition idiom), so no window string is ever built:
  * the interpreted `transform(sequence, i -> xxhash64(concat_ws(' ',
  * slice(toks, i, n))))` HOF it replaces allocated a slice + joined
  * string per window and measured ~2 s on the q_dup_substrings gate;
  * this generator streams rows lazily with zero per-window
  * allocation beyond the row. Tokens carry no whitespace (they come
  * from a whitespace split), so the joined-window identity the
  * DuckDB oracle groups on is injective in the token sequence and
  * the compositional fingerprint groups identically (64-bit
  * collisions ~1e-11, the repo-wide idiom). Documents with fewer
  * than n tokens generate nothing; pos is the 0-based window start. */
case class NgramHashPos(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {
  import org.apache.spark.sql.catalyst.expressions.XXH64
  import org.apache.spark.sql.catalyst.util.ArrayData
  import org.apache.spark.sql.types.{ArrayType, LongType}

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _ if n < 1 || n > 64 => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires 1 <= n <= 64, got $n")
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got $other")
  }

  override def elementSchema: StructType =
    new StructType().add("pos", LongType, nullable = false)
      .add("fp", LongType, nullable = false)

  override def prettyName: String = "ngram_hash_pos"

  private val Seed = 42L

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null) return Iterator.empty
    val m = arr.numElements()
    if (m < n) return Iterator.empty
    val th = new Array[Long](m)
    var i = 0
    while (i < m) {
      val s = arr.getUTF8String(i)
      th(i) =
        if (s == null) 0L
        else XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
          s.numBytes, Seed)
      i += 1
    }
    (0 to m - n).iterator.map { p =>
      var acc = XXH64.hashLong(n.toLong, Seed)
      var j = 0
      while (j < n) { acc = XXH64.hashLong(th(p + j) ^ acc, Seed); j += 1 }
      InternalRow(p.toLong, acc)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): NgramHashPos =
    copy(child = newChild)
}
