package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType, LongType}

/** Cosine similarity over two `array<float>` embedding columns as a native
  * Catalyst expression with whole-stage codegen.
  *
  * Spark 4.1 has no built-in cosine function (SURVEY.md §7.4); the reference
  * has no similarity operator at all — this is a north-star extension. A
  * native expression (vs a Scala UDF) keeps the kNN hot loop inside
  * WholeStageCodegen with zero boxing/serialization: the generated Java reads
  * floats straight out of Tungsten's UnsafeArrayData. At 100 TB the
  * brute-force pass is O(Q·N·d) multiply-adds — this inner loop IS the query,
  * so it must be tight.
  *
  * Accumulates in double (float inputs widened) — matches DuckDB's
  * `list_cosine_similarity` over `DOUBLE[]` for oracle comparison.
  * Returns NULL for zero-norm or empty vectors.
  *
  * (Lives in the org.apache.spark.sql namespace because `AbstractDataType`
  * is private[sql]; user-facing API is graft.functions.VectorFunctions.)
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  // Null ELEMENTS → NULL result (not a 0.0-contaminated partial sum):
  // registered in SQL as cosine_sim, so arbitrary arrays can arrive.
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; nx += xi * xi; ny += yi * yi; i += 1
    }
    if (nx == 0.0 || ny == 0.0) null else dot / math.sqrt(nx * ny)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  double $xi = (double) $x.getFloat($i);
         |  double $yi = (double) $y.getFloat($i);
         |  $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |}
         |if ($nx == 0.0 || $ny == 0.0) {
         |  ${ev.isNull} = true;
         |}
         |if (!${ev.isNull}) {
         |  ${ev.value} = $dot / java.lang.Math.sqrt($nx * $ny);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Squared Euclidean distance over two `array<double>` columns — the
  * centroid-assignment / IVF-probe inner loop as native codegen.
  *
  * The accumulation is a LEFT fold of (x−y)² in double, element order —
  * exactly the IEEE operation sequence of the declarative
  * `aggregate(zip_with(a, b, (x,y) => (x−y)*(x−y)), 0.0, +)` spelling
  * (and of DuckDB's `list_reduce(list_prepend(0.0, …), +)`), so swapping
  * this expression into an oracle-checked query changes no result bit —
  * only removes the interpreted per-element lambda cost (the re-eval
  * pitfall measured ~5× on portable simhash). Double inputs (not float):
  * the callers feed already-widened or quantized-integer arrays. */
case class SquaredDistance(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "squared_distance"

  // Length mismatch → NULL, matching the declarative spelling exactly:
  // zip_with pads the short side with null, so the fold yields NULL —
  // a truncated partial sum would be a plausible-looking wrong answer.
  // A null ELEMENT likewise poisons the declarative fold to NULL, so both
  // eval and codegen check isNullAt per element (the expression is
  // SQL-registered as squared_distance, where arbitrary arrays arrive).
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var d = 0.0; var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val diff = x.getDouble(i) - y.getDouble(i)
      d += diff * diff; i += 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val d = ctx.freshName("d"); val diff = ctx.freshName("diff")
      s"""
         |if ($x.numElements() != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $x.numElements();
         |  double $d = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $diff = $x.getDouble($i) - $y.getDouble($i);
         |    $d += $diff * $diff;
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $d; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Intersection SIZE of two value-sorted `array<long>` columns as a
  * two-pointer merge — the q98 verify kernel.
  *
  * `size(array_intersect(a, b))` builds a hash set and materializes the
  * intersection ARRAY per row pair, only to take its length; over the
  * ~190k candidate pairs of a prefix-filter join that allocation is the
  * whole verify cost (measured 2.3 s of q98's 5.2 s at sf0.1). The merge
  * needs no allocation at all: one linear pass, whole-stage-codegen'd.
  *
  * PRECONDITION: both arrays sorted ascending (the caller attaches
  * `array_sort`ed hashed-shingle arrays). Equal-value RUNS are skipped
  * past on a match, so duplicate elements count once — identical to
  * `array_intersect`'s set semantics, making the swap value-invisible
  * even if a caller feeds non-distinct arrays. NULL array → NULL; a NULL
  * element (impossible for the md5-hash arrays, possible via SQL) → NULL
  * rather than a plausible partial count. */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "sorted_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements(); val ny = y.numElements()
    var i = 0; var j = 0; var c = 0L
    while (i < nx && j < ny) {
      if (x.isNullAt(i) || y.isNullAt(j)) return null
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv < yv) i += 1
      else if (xv > yv) j += 1
      else {
        c += 1
        val v = xv
        while (i < nx && !x.isNullAt(i) && x.getLong(i) == v) i += 1
        while (j < ny && !y.isNullAt(j) && y.getLong(j) == v) j += 1
      }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c"); val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv"); val v = ctx.freshName("v")
      s"""
         |int $nx = $x.numElements(); int $ny = $y.numElements();
         |int $i = 0; int $j = 0; long $c = 0L;
         |while ($i < $nx && $j < $ny) {
         |  if ($x.isNullAt($i) || $y.isNullAt($j)) { ${ev.isNull} = true; break; }
         |  long $xv = $x.getLong($i); long $yv = $y.getLong($j);
         |  if ($xv < $yv) { $i++; }
         |  else if ($xv > $yv) { $j++; }
         |  else {
         |    $c++;
         |    long $v = $xv;
         |    while ($i < $nx && !$x.isNullAt($i) && $x.getLong($i) == $v) $i++;
         |    while ($j < $ny && !$y.isNullAt($j) && $y.getLong($j) == $v) $j++;
         |  }
         |}
         |if (!${ev.isNull}) { ${ev.value} = $c; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Dot product over two `array<float>` columns (double accumulation),
  * same codegen rationale as [[CosineSimilarity]]. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override def nullable: Boolean = true

  // Null ELEMENTS → NULL, same rationale as CosineSimilarity.
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      dot += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $dot += (double) $x.getFloat($i) * (double) $y.getFloat($i);
         |}
         |if (!${ev.isNull}) { ${ev.value} = $dot; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Exact integer dot product of two `array<bigint>` columns — the
  * q54-quantized int8 vectors' similarity kernel. The declarative
  * `aggregate(zip_with(a, b, _*_), 0L, _+_)` spelling is value-identical
  * but its higher-order-function lambdas evaluate INTERPRETED per row
  * (the q126 lesson); on candidate-pair relations (q139 hard negatives,
  * q158 re-rank) that per-pair CPU dominates the query. This expression
  * keeps the multiply-add loop inside whole-stage codegen reading longs
  * straight from UnsafeArrayData. |dot| ≤ D·127² ≈ 2²⁰ at D = 64 — no
  * overflow headroom concern until D ~ 5·10¹³. NULL element or a length
  * mismatch → NULL, exactly the fold's semantics (zip_with pads the
  * shorter array with NULLs, which poison the sum).
  *
  * `ansi = true` (used only by [[RewriteIntDotFold]], never the direct
  * `int_dot` API) reproduces the fold's ANSI-mode behavior exactly,
  * including its ERROR set and error ordering: `zip_with` materializes
  * every product of the overlapping prefix (overflow-CHECKED multiplies,
  * in index order, null elements skipped) before `aggregate` folds
  * (overflow-checked adds up to the FIRST NULL PRODUCT — which on a
  * length mismatch is the first padding slot — after which null poisons
  * the rest of the fold unchecked). The kernel therefore runs a
  * check-only multiply pass, then the checked prefix fold, EVEN on rows
  * whose result is NULL (a mismatched row's prefix adds can still
  * throw, exactly like the fold) — two passes, zero allocation, and an
  * input overflows the kernel iff it overflows the declarative spelling
  * (same SparkArithmeticException class via
  * [[QueryExecutionErrors.arithmeticOverflowError]]). */
case class IntDotProduct(left: Expression, right: Expression,
    ansi: Boolean = false)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "int_dot"

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    val ny = y.numElements()
    if (!ansi) {
      if (n != ny) return null
      var dot = 0L; var i = 0
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        dot += x.getLong(i) * y.getLong(i); i += 1
      }
      return dot
    }
    // ANSI arm — the fold's error set exactly, INCLUDING on rows whose
    // result is NULL: zip_with materializes checked products for the
    // whole overlapping prefix (phase 1), then aggregate runs checked
    // adds until the FIRST null product — which on a length mismatch is
    // the first padding slot at index min(n, ny), so the prefix adds
    // still run (and can still throw) before the null poisons the fold.
    val m = math.min(n, ny)
    var i = 0
    while (i < m) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        IntDotProduct.mulExact(x.getLong(i), y.getLong(i))
      }
      i += 1
    }
    var dot = 0L; i = 0
    while (i < m) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null // first null product
      dot = IntDotProduct.addExact(dot, x.getLong(i) * y.getLong(i))
      i += 1
    }
    if (n != ny) null else dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      if (!ansi) {
        s"""
           |int $n = $x.numElements();
           |long $dot = 0L;
           |if ($n != $y.numElements()) { ${ev.isNull} = true; }
           |for (int $i = 0; !${ev.isNull} && $i < $n; $i++) {
           |  if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
           |  $dot += $x.getLong($i) * $y.getLong($i);
           |}
           |if (!${ev.isNull}) { ${ev.value} = $dot; }
         """.stripMargin
      } else {
        // companion-object call from generated Java: class IntDotProduct$
        // (no static forwarders — the companion CLASS is the case class)
        val kernel = IntDotProduct.getClass.getName + ".MODULE$"
        val m = ctx.freshName("m"); val j = ctx.freshName("j")
        // mirror of nullSafeEval's ANSI arm: phase-1 checked multiplies
        // over the whole overlapping prefix, then checked adds until the
        // first null product — these run (and can throw) even when a
        // length mismatch makes the result NULL, exactly like the fold
        s"""
           |int $n = $x.numElements();
           |int $m = java.lang.Math.min($n, $y.numElements());
           |long $dot = 0L;
           |for (int $j = 0; $j < $m; $j++) {
           |  if (!$x.isNullAt($j) && !$y.isNullAt($j)) {
           |    $kernel.mulExact($x.getLong($j), $y.getLong($j));
           |  }
           |}
           |for (int $i = 0; $i < $m; $i++) {
           |  if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
           |  $dot = $kernel.addExact($dot, $x.getLong($i) * $y.getLong($i));
           |}
           |if ($n != $y.numElements()) { ${ev.isNull} = true; }
           |if (!${ev.isNull}) { ${ev.value} = $dot; }
         """.stripMargin
      }
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object IntDotProduct {
  import org.apache.spark.sql.errors.QueryExecutionErrors

  /** ANSI-faithful checked multiply: same error class + hint the
    * declarative `x * y` raises under ANSI mode. */
  def mulExact(a: Long, b: Long): Long =
    try java.lang.Math.multiplyExact(a, b)
    catch { case _: ArithmeticException =>
      throw QueryExecutionErrors.arithmeticOverflowError(
        "long overflow", "try_multiply", null)
    }

  /** ANSI-faithful checked add — the fold's `acc + v`. */
  def addExact(a: Long, b: Long): Long =
    try java.lang.Math.addExact(a, b)
    catch { case _: ArithmeticException =>
      throw QueryExecutionErrors.arithmeticOverflowError(
        "long overflow", "try_add", null)
    }
}

/** Exact integer squared L2 distance of two `array<bigint>` columns —
  * the codegen twin of [[IntDotProduct]] for the PQ/IVF re-rank stages
  * (q97/q153/q142), whose `(x−y)²` fold previously ran as interpreted
  * lambdas per shortlist pair. Σ(x−y)² ≤ D·254² at int8 scale — exact
  * in int64 with ~2⁴⁴ of headroom at D = 64. NULL element or a length
  * mismatch → NULL (the fold's semantics). */
case class IntSquaredDistance(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "int_squared_distance"

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0L; var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = x.getLong(i) - y.getLong(i)
      acc += d * d; i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val acc = ctx.freshName("acc"); val d = ctx.freshName("d")
      s"""
         |int $n = $x.numElements();
         |long $acc = 0L;
         |if ($n != $y.numElements()) { ${ev.isNull} = true; }
         |for (int $i = 0; !${ev.isNull} && $i < $n; $i++) {
         |  if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  long $d = $x.getLong($i) - $y.getLong($i);
         |  $acc += $d * $d;
         |}
         |if (!${ev.isNull}) { ${ev.value} = $acc; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Count of positions where two `array<bigint>` columns hold EQUAL
  * values — the MinHash signature-agreement kernel (est_jaccard =
  * matches / P), codegen'd for the candidate-pair hot loops (q24/q49
  * and the incremental-cluster gates) where the
  * `aggregate(zip_with(.., when(x === y, 1)..))` spelling evaluated
  * interpreted per pair. Fold semantics preserved EXACTLY: that fold's
  * `when` counts a NULL on either side (and zip_with's padding beyond
  * the shorter array) as 0 — it never poisons — so this expression
  * loops the shorter length, skips null elements, and returns NULL only
  * for a NULL input array. */
case class IntMatchCount(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "int_match_count"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var c = 0L; var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i) && x.getLong(i) == y.getLong(i))
        c += 1L
      i += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |long $c = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$x.isNullAt($i) && !$y.isNullAt($i)
         |      && $x.getLong($i) == $y.getLong($i)) { $c += 1L; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
