package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Multimodal

/** Multimodal-column plumbing queries (harness north-star): binary
  * payloads + typed Dataset + mapPartitions batch extraction. Payloads
  * are UTF-8 bytes of documents.text (deterministic stand-in — ASCII
  * corpus, so byte offsets == char offsets and the oracle can phrase the
  * same features over the text). */
object MultimodalQueries {

  private val features = QuerySpec(
    "q_mm_features",
    """SELECT doc_id AS media_id, 'text/plain' AS kind,
      |       CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
      |       CAST(unicode(substr(text, 1, 1)) AS BIGINT) AS first_byte,
      |       CAST(ceil(octet_length(encode(text)) / 256.0) AS BIGINT) AS n_chunks
      |FROM documents ORDER BY media_id""".stripMargin) { (s, d) =>
    val media = Multimodal.mediaFromDocuments(s, Tables.documents(s, d))
    Multimodal.extractFeatures(media, new Multimodal.FakeDecoder(chunkSize = 256))
      .toDF()
      .orderBy("media_id")
  }

  private val chunks = QuerySpec(
    "q_mm_chunks",
    """WITH n AS (SELECT doc_id, text,
      |             CAST(ceil(octet_length(encode(text)) / 256.0) AS BIGINT) AS nc
      |           FROM documents),
      |i AS (SELECT doc_id, text, unnest(range(0, nc)) AS chunk_idx FROM n)
      |SELECT doc_id AS media_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
      |       md5(substr(text, (chunk_idx * 256 + 1)::INT, 256)) AS chunk_md5
      |FROM i ORDER BY media_id, chunk_idx""".stripMargin) { (s, d) =>
    val media = Multimodal.mediaFromDocuments(s, Tables.documents(s, d))
    Multimodal.sampleChunks(media, chunkSize = 256)
      .toDF()
      .select(col("media_id"), col("chunk_idx"), md5(col("chunk")).as("chunk_md5"))
      .orderBy("media_id", "chunk_idx")
  }

  val all: Seq[QuerySpec] = Seq(features, chunks)
}
