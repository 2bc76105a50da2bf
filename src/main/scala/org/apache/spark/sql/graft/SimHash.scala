package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash (Charikar) over whitespace tokens — near-dup sketch.
  *
  * For each token, a 64-bit hash votes ±1 on each bit position; the final
  * fingerprint takes the sign of each position's tally. Documents with small
  * Hamming distance between fingerprints share most token content.
  *
  * One custom Expression beats composing 64 per-bit aggregates from
  * built-ins: a single pass over the tokens per document, O(tokens·64/word)
  * bit ops, no intermediate arrays. At 100 TB the fingerprint is 8 bytes per
  * doc — the dedup join then operates on fingerprints only, never text.
  *
  * Token hash: FNV-1a 64-bit (public domain spec) — engine-independent and
  * stable across JVM versions (unlike String.hashCode).
  */
case class SimHash(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"simhash64 requires STRING, got ${child.dataType.sql}")

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    val votes = new Array[Int](64)
    var start = 0
    var i = 0
    val n = s.length
    while (i <= n) {
      if (i == n || s.charAt(i) == ' ') {
        if (i > start) {
          val h = SimHash.fnv1a64(s, start, i)
          var j = 0
          while (j < 64) {
            if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
            j += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < 64) { if (votes(j) > 0) fp |= (1L << j); j += 1 }
    fp
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object SimHash {
  /** FNV-1a 64-bit over a char slice (chars folded as 2 bytes LE). */
  def fnv1a64(s: String, from: Int, until: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = from
    while (i < until) {
      val c = s.charAt(i)
      h = (h ^ (c & 0xff)) * 0x100000001b3L
      h = (h ^ ((c >> 8) & 0xff)) * 0x100000001b3L
      i += 1
    }
    h
  }
}
