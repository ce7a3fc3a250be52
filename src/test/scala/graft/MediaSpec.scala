package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Media

class MediaSpec extends SparkSuite {
  import spark.implicits._

  test("feature extraction matches the stub decoder row-wise") {
    val media = Media.mediaFromEvents(Tables.events(spark, sfDir))
    val feats = Media.extractFeatures(spark, media)
    val joined = media.select(col("media_id"), length(col("bytes")).cast("long").as("len"))
      .join(feats.toDF(), "media_id")
    assert(joined.filter(col("n_bytes") =!= col("len")).count() === 0)
    assert(joined.filter(col("fake_width") =!= col("n_bytes") % 64).count() === 0)
    assert(joined.filter(col("checksum") =!= col("n_bytes") * 31 + col("header_byte")).count() === 0)
  }

  test("frame sampling keeps every stride-th chunk with correct sizes") {
    val one = Seq((1L, "video", "0123456789abcdefghij".getBytes, "x"))
      .toDF("media_id", "kind", "bytes", "source")
    val frames = Media.sampleFrames(spark, one, frameSize = 8, stride = 2)
      .collect().sortBy(_.frame_idx)
    // 20 bytes → chunks [8,8,4] at idx 0,1,2 → kept idx 0 and 2
    assert(frames.map(_.frame_idx).toSeq === Seq(0L, 2L))
    assert(frames.map(_.frame_bytes.length).toSeq === Seq(8, 4))
    assert(new String(frames(0).frame_bytes) === "01234567")
  }

  test("non-video rows produce no frames") {
    val one = Seq((1L, "image", "0123456789".getBytes, "x"))
      .toDF("media_id", "kind", "bytes", "source")
    assert(Media.sampleFrames(spark, one).count() === 0)
  }
  test("resize halves image bytes (ceil), preserves header, skips non-images") {
    val rows = Seq(
      (1L, "image", "0123456789".getBytes, "x"),  // 10 -> 5 bytes: 0,2,4,6,8
      (2L, "image", "abcde".getBytes, "x"),       // 5 -> 3 bytes: a,c,e
      (3L, "audio", "abcde".getBytes, "x")        // untouched
    ).toDF("media_id", "kind", "bytes", "source")
    val out = Media.resizeImages(spark, rows).collect().sortBy(_.media_id)
    assert(new String(out(0).bytes) === "02468")
    assert(new String(out(1).bytes) === "ace")
    assert(new String(out(2).bytes) === "abcde")
  }
}
