package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.{MediaMeta, MediaRow}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: schema, metadata, partition-parallel
  * feature extraction (stub codec, real Spark shapes). */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val bin = Seq(
    (1L, "image-bytes-aaaa"), (2L, "image-bytes-bbbb"), (3L, "x"))
    .toDF("id", "s")
    .select($"id", encode($"s", "UTF-8").as("payload"))

  test("withDecodedMeta produces canonical media schema") {
    val out = Multimodal.withDecodedMeta(bin, "id", "payload", "image")
    assert(out.columns.toSeq ==
      Seq("id", "content", "meta", "n_bytes", "content_sha256"))
    val r = out.orderBy("id").collect()
    assert(r.length == 3)
    val meta = r(0).getStruct(2)
    assert(meta.getString(0) == "image")
    assert(meta.getInt(2) >= 32 && meta.getInt(3) >= 32) // stub dims plausible
    assert(r(0).getAs[Int]("n_bytes") == 16)
    assert(meta.getLong(4) == 0L, "images have no duration")
  }

  test("deterministic: same payload, same decoded meta") {
    val out1 = Multimodal.withDecodedMeta(bin, "id", "payload", "image")
      .select("content_sha256", "meta").collect()
    val out2 = Multimodal.withDecodedMeta(bin, "id", "payload", "image")
      .select("content_sha256", "meta").collect()
    assert(out1.sameElements(out2))
  }

  test("extractFeatures runs partition-parallel with normalized output") {
    val ds = Seq(
      MediaRow(1L, Array[Byte](0, 1, 2, 3), MediaMeta("image", "x", 8, 8, 0)),
      MediaRow(2L, Array[Byte](5, 5, 5, 5), MediaMeta("image", "x", 8, 8, 0)))
      .toDS().repartition(2)
    val feats = Multimodal.extractFeatures(ds, dim = 4).orderBy("id").collect()
    assert(feats.length == 2)
    val f2 = feats(1).getSeq[Float](1)
    assert(f2(1) == 1.0f, "all bytes hash to bucket 1 for value 5 % 4")
    assert(math.abs(feats.head.getSeq[Float](1).sum - 1.0f) < 1e-6)
  }

  test("sampleFrames explodes video rows at the requested cadence") {
    val df = Seq((7L, Array[Byte](1))).toDF("id", "payload")
    val media = Multimodal.withDecodedMeta(df, "id", "payload", "video")
    val frames = Multimodal.sampleFrames(media, everyMs = 60000L)
    val n = frames.count()
    val dur = media.select($"meta.durationMs").collect().head.getLong(0)
    assert(n == dur / 60000L + 1)
  }

  test("resize rewrites dimensions, keeps kind and duration") {
    val media = Multimodal.withDecodedMeta(bin, "id", "payload", "image")
    val r = Multimodal.resize(media, 224, 224).select($"meta").collect().head
      .getStruct(0)
    assert(r.getInt(2) == 224 && r.getInt(3) == 224)
    assert(r.getString(0) == "image")
  }
}
