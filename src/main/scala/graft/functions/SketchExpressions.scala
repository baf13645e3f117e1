package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-row text-sketch expressions: tokenize → hash → shingle →
  * MinHash/SimHash computed in ONE pass per document, text in,
  * sketch out.
  *
  * Why whole-pipeline expressions instead of composing built-ins
  * (split / transform / xxhash64 / aggregate):
  *  1. the explode→groupBy(k buffers) shape shuffles every shingle of
  *     every document — at 100 TB that multiplies the scan by the
  *     shingle count for a value that is a pure per-row function;
  *  2. composing lambdas re-computes shared sub-arrays: Catalyst's
  *     CollapseProject inlines the token-hash array into every shingle
  *     position's lambda (measured: the same token re-hashed ~250×
  *     per document, 0.3 s → 16 s on sf0.1).
  *
  * All hashing is engine-neutral (FNV-1a 64 over UTF-8 bytes +
  * rotate-xor shingle combine) and seeded deterministically — the
  * same corpus gives the same sketches on any cluster.
  */
object Sketches {

  val MersennePrime: Long = 2147483647L // 2^31-1: keeps a*x+b < 2^62

  /** k universal-hash coefficient pairs from a fixed seed. */
  def coeffs(k: Int, seed: Long): (Array[Long], Array[Long]) = {
    val rnd = new scala.util.Random(seed)
    val as = Array.fill(k)(1L + math.abs(rnd.nextLong()) % (MersennePrime - 1))
    val bs = Array.fill(k)(math.abs(rnd.nextLong()) % MersennePrime)
    (as, bs)
  }

  /** FNV-1a 64 of bytes[from, until). */
  private def fnv1a(bytes: Array[Byte], from: Int, until: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = from
    while (i < until) { h = (h ^ (bytes(i) & 0xff)) * 0x100000001b3L; i += 1 }
    h
  }

  /** Token count = spaces + 1: exactly `size(split(text, ' '))`
    * (single-space regex, limit −1 keeps trailing empties) without
    * building the token array.
    */
  def countTokens(text: UTF8String): Int = {
    val bytes = text.getBytes
    var n = 1
    var i = 0
    while (i < bytes.length) { if (bytes(i) == ' ') n += 1; i += 1 }
    n
  }

  /** Hash every space-separated token of `text`. */
  def tokenHashes(text: UTF8String): Array[Long] = {
    val bytes = text.getBytes
    var n = 1
    var i = 0
    while (i < bytes.length) { if (bytes(i) == ' ') n += 1; i += 1 }
    val out = new Array[Long](n)
    var start = 0
    var t = 0
    i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' ') {
        out(t) = fnv1a(bytes, start, i); t += 1; start = i + 1
      }
      i += 1
    }
    out
  }

  /** Rolling rotate-xor combination of `shingleSize` consecutive token
    * hashes; `distinct` sorts + dedupes (for set-Jaccard use).
    */
  def shingleCodes(text: UTF8String, shingleSize: Int, distinct: Boolean): Array[Long] = {
    val th = tokenHashes(text)
    val m = math.max(th.length - shingleSize + 1, if (th.length > 0) 1 else 0)
    val codes = new Array[Long](m)
    var i = 0
    while (i < m) {
      var acc = 0L
      var j = 0
      val end = math.min(shingleSize, th.length - i)
      while (j < end) {
        acc = java.lang.Long.rotateLeft(acc, 5) ^ th(i + j)
        j += 1
      }
      codes(i) = acc
      i += 1
    }
    if (!distinct) codes
    else {
      java.util.Arrays.sort(codes)
      var w = 0
      var r = 0
      while (r < codes.length) {
        if (w == 0 || codes(r) != codes(w - 1)) { codes(w) = codes(r); w += 1 }
        r += 1
      }
      java.util.Arrays.copyOf(codes, w)
    }
  }

  /** k MinHash values over the shingle codes. */
  def minhash(text: UTF8String, shingleSize: Int,
              as: Array[Long], bs: Array[Long]): Array[Long] = {
    val codes = shingleCodes(text, shingleSize, distinct = false)
    val p = MersennePrime
    val k = as.length
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, p - 1)
    var i = 0
    while (i < codes.length) {
      val x = ((codes(i) % p) + p) % p
      var j = 0
      while (j < k) {
        val h = (as(j) * x + bs(j)) % p
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    mins
  }

  /** LSH band keys: each r = k/bands slice of the signature mixed into
    * one long. */
  def minhashBands(text: UTF8String, shingleSize: Int,
                   as: Array[Long], bs: Array[Long], bands: Int): Array[Long] = {
    val mins = minhash(text, shingleSize, as, bs)
    val r = mins.length / bands
    val keys = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = 1125899906842597L
      var j = b * r
      while (j < (b + 1) * r) { acc = acc * 31 + mins(j); j += 1 }
      keys(b) = acc
      b += 1
    }
    keys
  }

  /** Jaccard of two sorted distinct long arrays by merge walk. */
  def jaccardSorted(a: Array[Long], b: Array[Long]): Double = {
    var i = 0
    var j = 0
    var inter = 0
    while (i < a.length && j < b.length) {
      if (a(i) == b(j)) { inter += 1; i += 1; j += 1 }
      else if (a(i) < b(j)) i += 1
      else j += 1
    }
    val union = a.length + b.length - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  /** FNV-1a 64 of every `win`-byte window at stride-aligned offsets
    * (0, stride, 2·stride, …). Character-level (not token-level)
    * fingerprints, the unit of exact substring-duplication detection:
    * two documents sharing any `win`-char run at aligned offsets
    * collide on a window hash. Texts shorter than `win` yield no
    * windows. Byte windows equal character windows for ASCII corpora
    * (the fixture contract shared with the DuckDB oracle).
    */
  def windowHashes(text: UTF8String, win: Int, stride: Int): Array[Long] = {
    val bytes = text.getBytes
    val n = bytes.length
    if (n < win) return Array.emptyLongArray
    val m = (n - win) / stride + 1
    val out = new Array[Long](m)
    var t = 0
    var i = 0
    while (t < m) { out(t) = fnv1a(bytes, i, i + win); t += 1; i += stride }
    out
  }

  /** 64-bit SimHash: sign of per-bit ±1 sums over token hashes. */
  def simhash(text: UTF8String): Long = {
    val th = tokenHashes(text)
    val counts = new Array[Int](64)
    var i = 0
    while (i < th.length) {
      val h = th(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }
}

/** Base for text→sketch expressions: StringType in, codegen calls the
  * (JIT-compiled) static helper shared with the interpreted path. */
abstract class TextSketchExpr extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName expects string, got $t")
  }
}

/** `size(split(text, ' '))` as one counting pass — no token array.
  * Installed automatically by [[graft.plans.ReplaceTokenCount]]; also
  * registered for SQL as `graft_token_count`.
  */
case class TokenCountExpr(child: Expression) extends TextSketchExpr {
  override def prettyName: String = "graft_token_count"
  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(v: Any): Any =
    Integer.valueOf(Sketches.countTokens(v.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.Sketches.countTokens($t);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** text → array<long> of distinct (or raw) shingle codes. */
case class ShingleCodesExpr(child: Expression, shingleSize: Int, distinct: Boolean)
    extends TextSketchExpr {
  override def prettyName: String = "graft_shingle_codes"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(v: Any): Any =
    new GenericArrayData(
      Sketches.shingleCodes(v.asInstanceOf[UTF8String], shingleSize, distinct))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.Sketches.shingleCodes($t, $shingleSize, $distinct));
       """.stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** text → array<long> of stride-aligned window fingerprints
  * ([[Sketches.windowHashes]]).
  */
case class WindowHashesExpr(child: Expression, win: Int, stride: Int)
    extends TextSketchExpr {
  require(win > 0 && stride > 0, "win and stride must be positive")
  override def prettyName: String = "graft_window_hashes"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(v: Any): Any =
    new GenericArrayData(
      Sketches.windowHashes(v.asInstanceOf[UTF8String], win, stride))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.Sketches.windowHashes($t, $win, $stride));
       """.stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** text → array<long> MinHash signature (k values). */
case class MinHashSigExpr(child: Expression, k: Int, shingleSize: Int, seed: Long)
    extends TextSketchExpr {
  override def prettyName: String = "graft_minhash"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val (as, bs) = Sketches.coeffs(k, seed)

  override protected def nullSafeEval(v: Any): Any =
    new GenericArrayData(
      Sketches.minhash(v.asInstanceOf[UTF8String], shingleSize, as, bs))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val asRef = ctx.addReferenceObj("mhAs", as, "long[]")
    val bsRef = ctx.addReferenceObj("mhBs", bs, "long[]")
    nullSafeCodeGen(ctx, ev, t =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.Sketches.minhash($t, $shingleSize, $asRef, $bsRef));
       """.stripMargin)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** text → array<long> of LSH band keys over the MinHash signature. */
case class MinHashBandsExpr(child: Expression, k: Int, bands: Int,
                            shingleSize: Int, seed: Long) extends TextSketchExpr {
  require(k % bands == 0, "bands must divide k")
  override def prettyName: String = "graft_minhash_bands"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val (as, bs) = Sketches.coeffs(k, seed)

  override protected def nullSafeEval(v: Any): Any =
    new GenericArrayData(
      Sketches.minhashBands(v.asInstanceOf[UTF8String], shingleSize, as, bs, bands))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val asRef = ctx.addReferenceObj("mhbAs", as, "long[]")
    val bsRef = ctx.addReferenceObj("mhbBs", bs, "long[]")
    nullSafeCodeGen(ctx, ev, t =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.Sketches.minhashBands($t, $shingleSize, $asRef, $bsRef, $bands));
       """.stripMargin)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Jaccard similarity of two SORTED distinct long arrays (as produced
  * by [[ShingleCodesExpr]] with distinct=true): one merge walk,
  * O(|a|+|b|), no per-call hash-set allocation like the built-in
  * array_intersect/array_union pair.
  */
case class JaccardSortedExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def prettyName: String = "graft_jaccard"
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects two array<bigint>, got ($l, $r)")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray()
    val y = b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray()
    java.lang.Double.valueOf(Sketches.jaccardSorted(x, y))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.Sketches.jaccardSorted($a.toLongArray(), $b.toLongArray());")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** text → 64-bit SimHash. */
case class SimHashExpr(child: Expression) extends TextSketchExpr {
  override def prettyName: String = "graft_simhash"
  override def dataType: DataType = LongType

  override protected def nullSafeEval(v: Any): Any =
    java.lang.Long.valueOf(Sketches.simhash(v.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.Sketches.simhash($t);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
