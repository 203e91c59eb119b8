package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  test("decode kernel computes exact byte statistics") {
    val f = Multimodal.decodeBytes(7L, Array[Byte](0, -1, 16)) // -1 = 0xff = 255
    assert(f.n_bytes == 3 && f.byte_sum == 271L && f.byte_max == 255)
    assert(f.mean_byte == 271.0 / 3)
  }

  test("feature extraction preserves row count and schema plumbing") {
    val docs = Tables.load(spark, sfDir, "documents").limit(50)
    val media = Multimodal.syntheticMedia(docs)
    assert(media.schema.fieldNames.toSeq == Seq("doc_id", "media", "meta"))
    val feats = Multimodal.extractFeatures(spark, media)
    assert(feats.count() == 50)
    assert(feats.filter(col("n_bytes") =!= 16).count() == 0)
  }

  test("frame sampling halves payload with stride 2") {
    val docs = Tables.load(spark, sfDir, "documents").limit(5)
    val sampled = Multimodal.frameSample(spark, Multimodal.syntheticMedia(docs), 2)
    sampled.collect().foreach { r =>
      assert(r.getAs[Array[Byte]]("sampled").length == 8)
    }
  }
}
