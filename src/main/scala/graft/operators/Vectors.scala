package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dense-vector column math over array<float>/array<double> columns,
  * expression-composed (codegen'd, no UDFs). Floats are widened to double
  * before accumulating so results are deterministic and engine-portable. */
object Vectors {

  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.DotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

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

  def maxAbs(a: Column): Column =
    aggregate(a, lit(0.0), (acc, v) => greatest(acc, abs(v.cast("double"))))

  /** Johnson–Lindenstrauss random projection to `outDim` dims with a
    * deterministic ±1 (Achlioptas) matrix: out[j] =
    * (Σ_i v[i]·s(j,i)) / √outDim, where the sign s(j,i) is +1 iff the
    * first hex nibble of md5("seed:j:i") is even — a derivation both
    * this engine (driver-side, once) and a SQL oracle (md5()) can
    * compute, which is what makes the projection hash-checkable.
    *
    * Scale shape: the sign matrix is outDim×inDim literals folded into
    * the plan (a few KB — it rides the task binary, no broadcast, no
    * join), and each output coordinate is a codegen'd zip_with +
    * aggregate fold over the row's own array — per-row work O(inDim ×
    * outDim), no shuffle, scan-speed on 100 TB of embeddings. The fold
    * accumulates left-to-right in array order, so results are
    * bit-deterministic across partitionings.
    *
    * The standard use: shrink 1k–4k-dim embeddings to 16–64 dims ahead
    * of ANN indexing / clustering, preserving pairwise distances within
    * the JL distortion bound. */
  def randomProject(
      v: Column, inDim: Int, outDim: Int, seed: Long = 42L): Column = {
    require(inDim > 0 && outDim > 0, "dims must be positive")
    val md = java.security.MessageDigest.getInstance("MD5")
    def sign(j: Int, i: Int): Double = {
      val d = md.digest(
        s"$seed:$j:$i".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      if ((((d(0) >> 4) & 0xf) & 1) == 0) 1.0 else -1.0
    }
    val scale = 1.0 / math.sqrt(outDim.toDouble)
    array((0 until outDim).map { j =>
      val signs = array((0 until inDim).map(i => lit(sign(j, i))): _*)
      aggregate(
        zip_with(v, signs, (x, s) => x.cast("double") * s),
        lit(0.0), (acc, x) => acc + x) * lit(scale)
    }: _*)
  }

  /** L2-normalize: the norm is computed in a separate projection column
    * (not inside the transform lambda, which would re-evaluate the
    * O(d) aggregate per element → O(d²) per row). */
  def withL2Normalized(df: DataFrame, vecCol: String,
      outCol: String = "unit_vec"): DataFrame =
    df.withColumn("_norm", norm(col(vecCol)))
      .withColumn(outCol,
        when(col("_norm") === 0.0,
          transform(col(vecCol), _ => lit(0.0)))
          .otherwise(transform(col(vecCol), x => x.cast("double") / col("_norm"))))
      .drop("_norm")

  /** Symmetric int8 quantization (scale = maxabs/127) — the standard 4×
    * memory cut for embedding storage/ANN at 100 TB. Rounding is
    * floor(x/scale + 0.5): explicit, engine-portable half-up. */
  def withInt8Quantized(df: DataFrame, vecCol: String): DataFrame =
    df.withColumn("q_scale", maxAbs(col(vecCol)) / 127.0)
      .withColumn("q_vec",
        when(col("q_scale") === 0.0, transform(col(vecCol), _ => lit(0)))
          .otherwise(transform(col(vecCol),
            x => floor(x.cast("double") / col("q_scale") + 0.5).cast("int"))))

  def dequantize(q: Column, scale: Column): Column =
    transform(q, x => x.cast("double") * scale)

  /** Element-wise mean vector per group (mean pooling): posexplode →
    * per-dimension decimal-exact average → reassemble in position order.
    * Two shuffles on (keys, pos) then (keys); cardinality is
    * |groups| × dim, independent of row count — scale-safe. */
  def meanPool(df: DataFrame, keyCols: Seq[String], vecCol: String,
      outCol: String = "mean_vec"): DataFrame = {
    val keys = keyCols.map(col)
    val perDim = df
      .select(keys :+ posexplode(col(vecCol)).as(Seq("pos", "e")): _*)
      .groupBy(keys :+ col("pos"): _*)
      .agg((sum(col("e").cast("decimal(27,12)")).cast("double") /
        count(lit(1))).as("avg_e"))
    perDim
      .groupBy(keys: _*)
      .agg(array_sort(collect_list(struct(col("pos"), col("avg_e"))))
        .as("_pairs"))
      .withColumn(outCol, transform(col("_pairs"), p => p.getField("avg_e")))
      .drop("_pairs")
  }
}
