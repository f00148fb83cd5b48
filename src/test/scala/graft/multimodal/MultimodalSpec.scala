package graft.multimodal

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.model.Tables

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("asMedia derives schema: binary payload + typed metadata") {
    val media = Multimodal.asMedia(Tables.documents(spark, sf()), "doc_id", "text")
    val schema = media.schema
    assert(schema("payload").dataType.typeName == "binary")
    assert(schema("media_id").dataType.typeName == "long")
    val row = media.head()
    val w = row.getInt(row.fieldIndex("width"))
    val h = row.getInt(row.fieldIndex("height"))
    assert(w >= 64 && w < 1344 && h >= 64 && h < 784)
  }

  test("feature extraction: deterministic histogram, L1 ≈ 1, right dim") {
    val media = Multimodal.asMedia(
      Tables.documents(spark, sf()).limit(20), "doc_id", "text")
    val feats = Multimodal.extractFeatures(spark, media).collect()
    assert(feats.length == 20)
    feats.foreach { f =>
      assert(f.features.length == Multimodal.FeatureDim)
      assert(math.abs(f.features.map(_.toDouble).sum - 1.0) < 1e-4)
      assert(f.checksum.length == 32)
    }
    // determinism: same input → same features
    val again = Multimodal.extractFeatures(spark, media).collect()
    assert(feats.map(_.features.toSeq).toSeq == again.map(_.features.toSeq).toSeq)
  }

  test("fakeDecodeFeatures matches a hand computation") {
    val bytes = Array[Byte](0, 1, 16, 17) // buckets 0,1,0,1
    val f = Multimodal.fakeDecodeFeatures(bytes)
    assert(f(0) == 0.5f && f(1) == 0.5f && f.drop(2).forall(_ == 0f))
  }

  test("sampleFrames emits one row per stride offset") {
    val media = Multimodal.asMedia(
      Tables.documents(spark, sf()).limit(3), "doc_id", "text")
    val frames = Multimodal.sampleFrames(media, stride = 100)
    val counts = frames.groupBy("media_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = media.select($"media_id", $"n_bytes").collect()
      .map(r => r.getLong(0) -> (1 + (r.getLong(1) - 1) / 100)).toMap
    assert(counts == expected)
  }

  test("extractFrames: fixed-size frames, stride filter, full coverage") {
    import spark.implicits._
    val df = Seq((1L, "a" * 600)).toDF("doc_id", "text")
    val frames = Multimodal.extractFrames(df, "doc_id", "text", 256, 1).collect()
    // 600 chars -> frames of 256, 256, 88
    assert(frames.map(_.getString(2).length).toSeq === Seq(256, 256, 88))
    val strided = Multimodal.extractFrames(df, "doc_id", "text", 256, 2).collect()
    assert(strided.map(_.getInt(1)).toSeq === Seq(0, 2))
  }

  test("fakeResize shrinks payload proportionally and updates metadata") {
    import spark.implicits._
    val media = Seq((1L, ("x" * 1000).getBytes, "image", 100, 100, 1000L))
      .toDF("media_id", "payload", "media_type", "width", "height", "n_bytes")
    val out = Multimodal.fakeResize(media, 50, 50).collect().head
    // pixel ratio (50*50)/(100*100) = 1/4 -> 250 bytes
    assert(out.getAs[Array[Byte]]("payload").length === 250)
    assert(out.getAs[Int]("width") === 50)
    assert(out.getAs[Long]("n_bytes") === 250L)
  }

  test("perceptual near-dup: identical payloads at 1.0, a same-length " +
    "edit stays above threshold, unrelated content below; banded join " +
    "finds them without all-pairs") {
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val edited = base.replace("tok20", "tok99") // same-length substitution
    val other = (1 to 40).map(i => s"zzz$i qq$i").mkString(" ")
    val docs = Seq((1L, base), (2L, base), (3L, edited), (4L, other))
      .toDF("doc_id", "text")
    val feats = Multimodal.extractPerceptualFeatures(
      spark, Multimodal.asMedia(docs, "doc_id", "text")).toDF()
      .select(col("media_id"), col("features"))
    val pairs = graft.similarity.Similarity.cosineNearDups(
        feats, "media_id", "features", threshold = 0.95,
        numPlanes = 16 * 8, bands = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs((1L, 2L)) == 1.0, s"identical payloads: $pairs")
    assert(pairs.contains((1L, 3L)) && pairs((1L, 3L)) >= 0.95,
      s"same-length edit shares all other blocks: $pairs")
    assert(!pairs.keySet.exists { case (a, b) => a == 4L || b == 4L },
      s"unrelated payload must not pair: $pairs")
  }

  test("fakeDecodeBlockFeatures: hand computation over two 8-byte blocks") {
    val payload = ("A" * 8 + "B" * 8).getBytes("US-ASCII")
    val f = Multimodal.fakeDecodeBlockFeatures(payload)
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(s: String): Int = {
      val d = md.digest(s.getBytes("US-ASCII"))
      math.floorMod(((d(0) & 0xff) << 24) | ((d(1) & 0xff) << 16) |
        ((d(2) & 0xff) << 8) | (d(3) & 0xff), Multimodal.FeatureDim)
    }
    val (b1, b2) = (bucket("A" * 8), bucket("B" * 8))
    val expected = Array.fill(Multimodal.FeatureDim)(0f)
    expected(b1) += 0.5f
    expected(b2) += 0.5f
    assert(f.toSeq == expected.toSeq)
  }

  test("asBinaryMedia synthesizes full-range bytes; checksum matches a " +
    "hand computation over the hex encoding") {
    val docs = Seq((7L, "x" * 40)).toDF("doc_id", "text")
    val media = Multimodal.asBinaryMedia(docs, "doc_id", "text")
    val row = media.head()
    val payload = row.getAs[Array[Byte]]("payload")
    // 40 chars → ceil(40/16) = 3 blocks of 16 bytes
    assert(payload.length === 48)
    assert(row.getAs[Long]("n_bytes") === 48L)
    // true binary: md5 chains contain bytes outside printable ASCII
    assert(payload.exists(b => (b & 0xff) < 0x20 || (b & 0xff) > 0x7e),
      "payload should not be printable text")
    // block i = md5("x"*40 + ":" + i) raw bytes
    val md = java.security.MessageDigest.getInstance("MD5")
    val expected = (0 until 3).flatMap(i => md.digest(("x" * 40 + ":" + i)
      .getBytes("UTF-8")).toSeq).toArray
    assert(payload.sameElements(expected))
    // extractFeatures checksum = md5 of the UPPERCASE hex of the payload
    val feat = Multimodal.extractFeatures(spark, media).head()
    val hexUpper = payload.map(b => f"${b & 0xff}%02X").mkString
    val want = md.digest(hexUpper.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(feat.checksum === want)
  }
}
