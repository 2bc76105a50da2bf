package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling-hash document fingerprint (base-31 over UTF-8 bytes,
  * mod the prime 2^58-27) as a codegen'd Catalyst expression.
  *
  * North-star text-analysis extension (no counterpart in the reference).
  * Purpose: a cheap 64-bit content fingerprint for exact-dup detection /
  * shard-local grouping at 100 TB scale — half the width of md5, computed
  * in one pass over the bytes with no allocation, and prefix-composable
  * (a rolling hash can be resumed across chunks, unlike md5 here).
  *
  * The modulus must satisfy (M-1)*31 + 255 < 2^63 or the h*31 step
  * silently wraps in Java long arithmetic (the original 2^61-1 modulus
  * had exactly this bug — caught by the q46 DuckDB oracle, whose HUGEINT
  * arithmetic computed the true value). 2^58-27 is the largest prime
  * leaving the full headroom.
  */
case class RollingHash(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"rolling_hash requires STRING, got ${child.dataType.sql}")

  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[UTF8String].getBytes
    var h = 0L; var i = 0
    val M = RollingHash.Mod
    while (i < bytes.length) {
      h = (h * 31 + (bytes(i) & 0xff)) % M
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val bytes = ctx.freshName("bytes"); val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |byte[] $bytes = $s.getBytes();
         |long $h = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = ($h * 31L + ($bytes[$i] & 0xff)) % ${RollingHash.Mod}L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object RollingHash {
  /** Largest prime with (Mod-1)*31 + 255 < 2^63 (no 64-bit overflow). */
  val Mod: Long = (1L << 58) - 27
}

/** Heuristic language identification by stopword-profile hit counting.
  *
  * The classic cheap lang-ID: count occurrences of each language's
  * high-frequency function words in the token stream; highest scoring
  * profile wins, ties broken by profile order, score 0 → "und"
  * (undetermined). Profiles are the standard top function words of each
  * language — public linguistic knowledge, deterministic.
  *
  * Implemented as an interpreted Catalyst expression (no codegen — string
  * scanning dominates; called once per document, not in a tight join loop).
  */
case class LangId(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = StringType
  override def prettyName: String = "lang_id"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"lang_id requires STRING, got ${child.dataType.sql}")

  override def nullSafeEval(v: Any): Any = {
    val tokens = v.asInstanceOf[UTF8String].toString
      .toLowerCase.split("\\s+")
    var best = "und"; var bestScore = 0
    LangId.Profiles.foreach { case (lang, words) =>
      var score = 0
      var i = 0
      while (i < tokens.length) { if (words(tokens(i))) score += 1; i += 1 }
      if (score > bestScore) { best = lang; bestScore = score }
    }
    UTF8String.fromString(best)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** One-pass implementation of the engine-portable SimHash (md5-derived
  * 60-bit token hashes, bit-tally sign fingerprint).
  *
  * Produces values IDENTICAL to the declarative built-in pipeline
  * `transform(split(text,' '), t -> conv(substr(md5(t),1,15),16,10))`
  * + 60 aggregate() bit tallies (DedupSpec asserts the equality, and the
  * q25/q46 DuckDB oracles recompute the same values in SQL) — but ~5×
  * faster: higher-order functions are interpreted per-lambda-per-element
  * in Spark, so the 60 tally passes dominated q25/q46. Here the whole
  * fingerprint is one tight Java loop per document (CodegenFallback: one
  * virtual call per row is noise next to the md5 work).
  */
case class PortableSimHash(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "portable_simhash"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"portable_simhash requires STRING, got ${child.dataType.sql}")

  override def nullSafeEval(v: Any): Any = {
    // split(" ", -1) replicates Spark's split(): trailing empties kept
    val tokens = v.asInstanceOf[UTF8String].toString.split(" ", -1)
    val md = java.security.MessageDigest.getInstance("MD5")
    val tally = new Array[Int](60)
    tokens.foreach { t =>
      md.reset()
      val dig = md.digest(t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // first 15 hex chars of the digest = first 60 bits, big-endian
      var h = 0L
      var i = 0
      while (i < 7) { h = (h << 8) | (dig(i) & 0xffL); i += 1 }
      h = (h << 4) | ((dig(7) & 0xffL) >>> 4)
      var j = 0
      while (j < 60) {
        if (((h >>> j) & 1L) == 1L) tally(j) += 1 else tally(j) -= 1
        j += 1
      }
    }
    var fp = 0L
    var j = 0
    while (j < 60) { if (tally(j) > 0) fp |= 1L << j; j += 1 }
    fp
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** One-pass implementation of the engine-portable MinHash signature
  * (word-3-gram shingles, md5-derived 32-bit shingle hashes, P affine
  * permutation minima).
  *
  * Produces values IDENTICAL to the declarative spelling
  * (`split` → shingle lambda → `conv(substr(md5(s),1,8),16,10) % p` →
  * P × `array_min(transform(...))`) — DedupSpec asserts the equality and
  * the q24/q48 DuckDB oracles recompute the same signatures in SQL — but
  * in one tight loop per document: shingle construction, md5, and all P
  * permutation minima fused, no intermediate arrays, no interpreted
  * lambda passes. `array_distinct` in the declarative form is dropped
  * here because min over a multiset equals min over its distinct set.
  */
case class PortableMinHash(child: Expression, perms: Seq[(Long, Long)],
    prime: Long) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def prettyName: String = "portable_minhash"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"portable_minhash requires STRING, got ${child.dataType.sql}")

  private lazy val as: Array[Long] = perms.map(_._1).toArray
  private lazy val bs: Array[Long] = perms.map(_._2).toArray

  override def nullSafeEval(v: Any): Any = {
    val tokens = v.asInstanceOf[UTF8String].toString.split(" ", -1)
    val L = tokens.length
    val n = math.max(L - 2, 1)
    val md = java.security.MessageDigest.getInstance("MD5")
    val P = as.length
    val mins = Array.fill(P)(Long.MaxValue)
    var i = 0
    while (i < n) {
      // shingle i (0-based) = w[i], w[min(i+1,L-1)], w[min(i+2,L-1)]
      val s = tokens(i) + " " + tokens(math.min(i + 1, L - 1)) + " " +
        tokens(math.min(i + 2, L - 1))
      md.reset()
      val dig = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // first 8 hex chars of the digest = first 4 bytes, big-endian
      var h = 0L; var b = 0
      while (b < 4) { h = (h << 8) | (dig(b) & 0xffL); b += 1 }
      h %= prime
      var j = 0
      while (j < P) {
        val perm = (as(j) * h + bs(j)) % prime
        if (perm < mins(j)) mins(j) = perm
        j += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(mins)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object LangId {
  /** Top function words per language (standard frequency lists). Order
    * fixed → deterministic tie-breaking. */
  val Profiles: Seq[(String, Set[String])] = Seq(
    "en" -> Set("the", "of", "and", "to", "a", "in", "is", "it", "that",
      "was", "for", "on", "are", "with", "as"),
    "de" -> Set("der", "die", "und", "das", "ist", "nicht", "ein", "mit",
      "von", "den", "zu", "im", "sich", "auf", "für"),
    "es" -> Set("el", "la", "de", "que", "y", "en", "un", "los", "se",
      "del", "las", "por", "con", "una", "es"),
    "fr" -> Set("le", "la", "de", "et", "les", "des", "est", "un", "une",
      "du", "dans", "que", "pour", "qui", "sur"),
    "zh" -> Set("的", "是", "在", "了", "有", "和", "人", "这", "中",
      "大", "为", "上", "个", "国", "我"))
}
