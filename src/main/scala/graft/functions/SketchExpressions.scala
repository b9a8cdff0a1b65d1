package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the sketch hot loops of the dedup /
  * similarity operators. The equivalent built-in higher-order-function
  * compositions (`transform(sequence(...), j -> array_min(transform(...)))`)
  * are interpreted per-lambda-call and measured ~1000× slower (85s for
  * 500 docs at 64 hashes); these evaluate in one tight pass per row.
  *
  * Hashing: FNV-1a 64 over UTF-8 bytes + splitmix64 finalizer per seed —
  * an independent-enough family for MinHash/SimHash banding (no
  * cross-engine oracle depends on the exact hash values).
  *
  * All five expressions participate in whole-stage codegen: the
  * generated code calls the compiled per-row method through a codegen
  * reference object (config like n/bands/k rides on the instance), so
  * no CodegenFallback node interrupts the fused pipeline.
  */
object Sketch {
  @inline final def mix64(zIn: Long): Long = {
    var z = zIn
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  final def fnv1a64(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** Per-slot seed constants (fixed, deterministic). */
  final def seed(j: Int): Long = mix64(0x9e3779b97f4a7c15L * (j + 1))
}

/** shingle_set(text, n, distinct) → array<string>: lowercase, tokenize
  * to [a-z0-9]+ runs, emit space-joined word n-grams — the whole
  * tokenize→ngram pipeline in one pass (the filter/transform/slice/
  * concat_ws composition allocates per element and is interpreted).
  * Token semantics match `split(lower(text), '[^a-z0-9]+')` exactly so
  * the DuckDB oracles stay valid. */
case class ShingleSet(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    evalShingles(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingleSet", this,
      classOf[ShingleSet].getName)
    defineCodeGen(ctx, ev, c => s"$ref.evalShingles($c)")
  }

  def evalShingles(input: UTF8String): ArrayData = {
    // Locale.ROOT: a tr_TR default locale would map 'I' to dotless ı,
    // silently dropping tokens vs the locale-independent SQL lower()
    val s = input.toString.toLowerCase(java.util.Locale.ROOT)
    val toks = new java.util.ArrayList[String]()
    var i = 0
    val len = s.length
    while (i < len) {
      while (i < len && !isAlnum(s.charAt(i))) i += 1
      val start = i
      while (i < len && isAlnum(s.charAt(i))) i += 1
      if (i > start) toks.add(s.substring(start, i))
    }
    val m = toks.size - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new java.util.ArrayList[UTF8String](m)
    val seen = if (distinct) new java.util.HashSet[String]() else null
    val sb = new java.lang.StringBuilder()
    var g = 0
    while (g < m) {
      sb.setLength(0)
      var w = 0
      while (w < n) {
        if (w > 0) sb.append(' ')
        sb.append(toks.get(g + w))
        w += 1
      }
      val gram = sb.toString
      if (seen == null || seen.add(gram)) out.add(UTF8String.fromString(gram))
      g += 1
    }
    new GenericArrayData(out.toArray)
  }

  private def isAlnum(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** minhash_signature(shingles, k) → array<long>: slot j is
  * min over shingles of mix64(fnv1a(s) ^ seed_j). */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    evalSignature(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minHash", this,
      classOf[MinHashSignature].getName)
    defineCodeGen(ctx, ev, c => s"$ref.evalSignature($c)")
  }

  def evalSignature(arr: ArrayData): ArrayData = {
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val base = Sketch.fnv1a64(arr.getUTF8String(i).getBytes)
      var j = 0
      while (j < numHashes) {
        val h = Sketch.mix64(base ^ Sketch.seed(j))
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** band_hashes(signature, bands) → array<long>: signature split into
  * `bands` equal slices, each slice order-sensitively hashed to one long.
  * Array position = band index (posexplode pairs them back). */
case class BandHashes(child: Expression, bands: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    evalBands(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bandHashes", this,
      classOf[BandHashes].getName)
    defineCodeGen(ctx, ev, c => s"$ref.evalBands($c)")
  }

  def evalBands(sig: ArrayData): ArrayData = {
    val n = sig.numElements()
    val rows = n / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = Sketch.seed(b)
      var r = 0
      while (r < rows) {
        h = Sketch.mix64(h ^ sig.getLong(b * rows + r))
        r += 1
      }
      out(b) = h
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** simhash64(tokens) → long: 64-bit SimHash over token hashes. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    SimHash64.evalTokens(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SimHash64.evalTokens($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64 {
  /** Static per-row fold shared by both execution paths. */
  def evalTokens(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val h = Sketch.mix64(Sketch.fnv1a64(arr.getUTF8String(i).getBytes))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

/** hyperplane_signature(vec, k) → long: Charikar sign-LSH with
  * deterministic ±1 hyperplanes derived from mix64(j·P + i). k ≤ 64. */
case class HyperplaneSignature(child: Expression, k: Int)
    extends UnaryExpression {
  require(k <= 64, "at most 64 hyperplane bits fit one long")
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hyperplane", this,
      classOf[HyperplaneSignature].getName)
    defineCodeGen(ctx, ev, c => s"$ref.evalVec($c)")
  }

  private def component(e: ArrayData, i: Int): Double = child.dataType match {
    case ArrayType(FloatType, _) => e.getFloat(i).toDouble
    case _ => e.getDouble(i)
  }

  override protected def nullSafeEval(input: Any): Any =
    evalVec(input.asInstanceOf[ArrayData])

  def evalVec(vec: ArrayData): Long = {
    val dim = vec.numElements()
    var sig = 0L
    var j = 0
    while (j < k) {
      var dot = 0.0
      var i = 0
      while (i < dim) {
        val sign =
          if ((Sketch.mix64(j.toLong * 0x9e3779b97f4a7c15L + i) & 1L) == 0L) 1.0
          else -1.0
        dot += component(vec, i) * sign
        i += 1
      }
      if (dot > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
