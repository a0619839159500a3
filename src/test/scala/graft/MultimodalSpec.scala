package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, "abcdefgh" * 16),            // 128 bytes
    (1L, "short"),                    // 5 bytes
    (2L, "x" * 64))                   // exactly one frame
    .toDF("doc_id", "text")

  test("media table has binary payload and typed metadata") {
    val m = Multimodal.mediaFromDocs(docs)
    val sch = m.schema
    assert(sch("payload").dataType == BinaryType)
    assert(sch("meta").dataType.isInstanceOf[StructType])
    val r = m.where(col("media_id") === 0).collect().head
    assert(r.getAs[Array[Byte]]("payload").length == 128)
    assert(r.getAs[org.apache.spark.sql.Row]("meta").getAs[Int]("n_bytes") == 128)
    assert(Set("image", "audio", "video").contains(r.getAs[String]("kind")))
  }

  test("decode stub computes deterministic byte features per partition") {
    val f = Multimodal.decodeStub(Multimodal.mediaFromDocs(docs))
      .select("media_id", "n_bytes", "byte_mean", "head_hex")
      .as[(Long, Int, Double, String)].collect().sortBy(_._1)
    assert(f(1)._2 == 5)
    // "short" bytes: s=115 h=104 o=111 r=114 t=116 -> mean 112.0
    assert(f(1)._3 == 112.0)
    assert(f(1)._4 == "73686f7274")
    assert(f(0)._2 == 128)
  }

  test("resize stub subsamples payload bytes deterministically") {
    val r = Multimodal.resizeStub(Multimodal.mediaFromDocs(docs), 4)
      .where(col("media_id") === 1)
      .select("payload", "n_bytes").collect().head
    // "short" (5 bytes) at factor 4 -> bytes at offsets 0 and 4: 's','t'
    assert(r.getInt(1) == 2)
    assert(new String(r.getAs[Array[Byte]](0)) == "st")
  }

  test("frame sampling yields expected frame counts and frame bytes") {
    val fr = Multimodal.frameSample(Multimodal.mediaFromDocs(docs), 64, 16)
      .select("media_id", "n_frames").as[(Long, Int)].collect().sortBy(_._1)
    assert(fr.toSeq == Seq((0L, 5), (1L, 0), (2L, 1))) // (128-64)/16+1 = 5
    val frames = Multimodal.frameSample(Multimodal.mediaFromDocs(docs), 64, 16)
      .where(col("media_id") === 2).select("frames")
      .as[Seq[Array[Byte]]].collect().head
    assert(frames.length == 1 && frames.head.length == 64)
  }

  test("featurize stub emits deterministic fixed-width float vectors that feed the ANN ops") {
    val m = Multimodal.featurizeStub(Multimodal.mediaFromDocs(docs), dim = 8)
    val vs = m.select("media_id", "embedding")
      .as[(Long, Seq[Float])].collect().sortBy(_._1)
    assert(vs.forall(_._2.length == 8))
    assert(vs.forall(_._2.forall(x => x >= 0f && x <= 1f)))
    // deterministic across evaluations
    val again = Multimodal.featurizeStub(Multimodal.mediaFromDocs(docs), 8)
      .select("media_id", "embedding").as[(Long, Seq[Float])].collect().sortBy(_._1)
    assert(vs.toSeq == again.toSeq)
    // and the output plugs straight into the similarity surface
    val q = vs.head._2.toArray
    val topk = graft.ops.Similarity.bruteForceTopK(
      m.select(col("media_id").as("vec_id"), col("embedding")),
      "vec_id", "embedding", q, 2).collect()
    assert(topk.length == 2 && topk.head.getLong(0) == vs.head._1)
  }
}
