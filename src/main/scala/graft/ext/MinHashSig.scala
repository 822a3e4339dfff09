package graft.ext

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass MinHash signature of a document's character k-shingles.
  *
  * The composable formulation (explode shingles → numHashes × xxhash64 →
  * groupBy min) is shuffle-efficient (partial agg collapses pre-shuffle) but
  * costs `numHashes` full hashes per shingle and materializes a row per
  * shingle. This native expression computes the whole signature in one scan:
  * TWO xxhash64 per shingle, then Kirsch-Mitzenmacher double hashing
  * (h_i = h1 + i·h2 — provably preserves MinHash's collision bounds) for the
  * remaining `numHashes - 2` values, updating running minima in registers.
  * No explode, no aggregation, no extra rows — per-document cost drops ~16×
  * for the standard 32-hash configuration, which is the difference that
  * matters when fingerprinting a 100 TB corpus.
  *
  * Shingle semantics match [[graft.ml.Dedup.shingles]] (reference polars has
  * no minhash; this is the training-pipeline extension): lowercase,
  * whitespace collapsed to single spaces, k code points per shingle,
  * duplicates irrelevant under min.
  */
case class MinHashSig(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val actual = children.map(_.dataType)
    if (actual == Seq(StringType, IntegerType, IntegerType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_minhash expects (string, int, int), got $actual")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"
  override def foldable: Boolean = children.forall(_.foldable)

  override protected def nullSafeEval(t: Any, k: Any, n: Any): Any =
    MinHashSig.compute(t.asInstanceOf[UTF8String], k.asInstanceOf[Int], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, k, n) => s"graft.ext.MinHashSig.compute($t, $k, $n)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): MinHashSig =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object MinHashSig {
  private val Seed1 = 42L
  private val Seed2 = 7919L

  /** Shared by interpreted eval and generated code. */
  def compute(text: UTF8String, k: Int, numHashes: Int): GenericArrayData = {
    require(k >= 1, s"graft_minhash: shingle size k must be >= 1, got $k")
    require(numHashes >= 1, s"graft_minhash: numHashes must be >= 1, got $numHashes")
    val norm = UTF8String.fromString(
      text.toString.replaceAll("\\s+", " ")).toLowerCase
    val len = norm.numChars()
    val sig = Array.fill(numHashes)(Long.MaxValue)
    val last = math.max(len - k, 0)
    var p = 0
    while (p <= last) {
      val sub = norm.substringSQL(p + 1, k)
      val h1 = XxHash64Function.hash(sub, StringType, Seed1)
      val h2 = XxHash64Function.hash(sub, StringType, Seed2)
      var i = 0
      var h = h1
      while (i < numHashes) {
        if (h < sig(i)) sig(i) = h
        h += h2
        i += 1
      }
      p += 1
    }
    new GenericArrayData(sig)
  }
}
