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
    * sign of <v, h_j> where hyperplane component h_j[i] = ±1 derived
    * deterministically from mix64(j, i) — no stored planes, computable on
    * any executor. Packed into one long (k ≤ 64). Native expression
    * (graft.functions.HyperplaneSignature) — one pass per row. */
  def hyperplaneSignature(v: Column, k: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}
    toCol(graft.functions.HyperplaneSignature(toExpr(v), k))
  }

  /** Split a packed signature into band values for bucket joins. */
  def signatureBands(sig: Column, bands: Int, bitsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)), b => struct(
      b.as("band"),
      call_function("shiftright", sig, b * lit(bitsPerBand))
        .bitwiseAND(lit((1L << bitsPerBand) - 1)).as("key")))
}
