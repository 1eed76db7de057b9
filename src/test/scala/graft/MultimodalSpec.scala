package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite {
  import TestSession.{spark, sfDir}

  lazy val media = Multimodal.mediaFromDocuments(spark, Tables.documents(spark, sfDir))

  test("chunks reassemble byte-exactly to the original payload") {
    import spark.implicits._
    val reassembled = Multimodal.sampleChunks(media, 256)
      .groupByKey(_.media_id)
      .mapGroups { (id, it) =>
        val bytes = it.toSeq.sortBy(_.chunk_idx).flatMap(_.chunk).toArray
        (id, new String(bytes, "UTF-8"))
      }.toDF("doc_id", "round_trip")
    val diff = Tables.documents(spark, sfDir)
      .join(reassembled, "doc_id")
      .filter(col("text") =!= col("round_trip"))
      .count()
    assert(diff === 0)
  }

  test("features agree with driver-side recomputation") {
    val feats = Multimodal.extractFeatures(media, new Multimodal.FakeDecoder(256))
      .collect().map(f => f.media_id -> f).toMap
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
    docs.foreach { r =>
      val id = r.getLong(0); val text = r.getString(1)
      val f = feats(id)
      assert(f.byte_len === text.getBytes("UTF-8").length.toLong)
      assert(f.first_byte === (text.getBytes("UTF-8")(0) & 0xff).toLong)
      assert(f.n_chunks === (f.byte_len + 255) / 256)
    }
  }
}
