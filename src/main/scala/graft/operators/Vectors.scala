package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector column math over array<float>/array<double> columns,
  * expression-composed (codegen'd, no UDFs). Floats are widened to double
  * before accumulating so results are deterministic and engine-portable. */
object Vectors {

  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  def l2Distance(a: Column, b: Column): Column =
    sqrt(aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double"); d * d
      }),
      lit(0.0), (acc, v) => acc + v))

  /** Random-hyperplane LSH bit signature (Charikar sign-LSH): bit j is the
    * sign of <v, h_j> where hyperplane component h_j[i] = ±1 derived from
    * murmur3(j, i) — deterministic, no stored planes, computable on any
    * executor. Packed into one long (k ≤ 64). */
  def hyperplaneSignature(v: Column, k: Int): Column = {
    require(k <= 64, "at most 64 hyperplane bits fit one long")
    val bits = transform(sequence(lit(0), lit(k - 1)), j => {
      val d = aggregate(
        zip_with(v, sequence(lit(0), size(v) - 1), (x, i) =>
          x.cast("double") *
            when(pmod(hash(j, i), lit(2)) === 0, lit(1.0)).otherwise(lit(-1.0))),
        lit(0.0), (acc, x) => acc + x)
      when(d > 0, lit(1L)).otherwise(lit(0L))
    })
    aggregate(
      zip_with(bits, sequence(lit(0), lit(k - 1)),
        (b, i) => call_function("shiftleft", b, i)),
      lit(0L), (a, b) => a.bitwiseOR(b))
  }

  /** Split a packed signature into band values for bucket joins. */
  def signatureBands(sig: Column, bands: Int, bitsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)), b => struct(
      b.as("band"),
      call_function("shiftright", sig, b * lit(bitsPerBand))
        .bitwiseAND(lit((1L << bitsPerBand) - 1)).as("key")))
}
