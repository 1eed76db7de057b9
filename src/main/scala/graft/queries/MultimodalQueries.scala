package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.{HashIndex, Multimodal}

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

  /** REAL header decode, oracle-certified round-trip: Spark synthesizes
    * a PNG (even doc_id) or JPEG (odd) payload whose dimensions are pure
    * doc_id arithmetic, then parses the dimensions BACK from the bytes
    * with [[Multimodal.ImageHeaders]]; DuckDB computes the expected
    * arithmetic directly. A parser or synthesizer bug on any byte layout
    * breaks the hash. */
  private val dims = QuerySpec(
    "q_mm_dims",
    """SELECT doc_id AS media_id,
      |       CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS format,
      |       CAST(doc_id % 1000 + 1 AS INTEGER) AS width,
      |       CAST(doc_id % 777 + 1 AS INTEGER) AS height
      |FROM documents ORDER BY media_id""".stripMargin) { (s, d) =>
    import s.implicits._
    val media = Tables.documents(s, d).select(col("doc_id")).as[Long].map { id =>
      val (w, h) = ((id % 1000 + 1).toInt, (id % 777 + 1).toInt)
      if (id % 2 == 0)
        Multimodal.MediaRecord(id, "image/png", Multimodal.ImageHeaders.syntheticPng(w, h), 0, 0)
      else
        Multimodal.MediaRecord(id, "image/jpeg", Multimodal.ImageHeaders.syntheticJpeg(w, h), 0, 0)
    }
    Multimodal.decodeDims(media).toDF().orderBy("media_id")
  }

  /** Audio RIFF/WAVE metadata (operators.Multimodal.AudioHeaders) —
    * same contract as q_mm_dims: payloads are REAL synthesized WAV
    * containers whose parameters derive from doc_id, the engine PARSES
    * the bytes, the oracle recomputes the arithmetic directly. A
    * writer or chunk-walker bug on any byte layout breaks the hash. */
  private val audio = QuerySpec(
    "q_mm_audio",
    """SELECT doc_id AS media_id, 'wav' AS format,
      |       CAST(doc_id % 2 + 1 AS INTEGER) AS channels,
      |       CAST(CASE doc_id % 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000 ELSE 44100 END AS INTEGER) AS sample_rate_hz,
      |       CAST(16 AS INTEGER) AS bits_per_sample,
      |       CAST(doc_id % 500 + 1 AS BIGINT) AS n_frames,
      |       CAST((doc_id % 500 + 1) * 1000 //
      |            (CASE doc_id % 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000 ELSE 44100 END) AS BIGINT) AS duration_ms
      |FROM documents ORDER BY media_id""".stripMargin) { (s, d) =>
    import s.implicits._
    val media = Tables.documents(s, d).select(col("doc_id")).as[Long].map { id =>
      val rate = (id % 3) match { case 0 => 8000; case 1 => 16000; case _ => 44100 }
      Multimodal.MediaRecord(id, "audio/wav",
        Multimodal.AudioHeaders.syntheticWav(
          (id % 2 + 1).toInt, rate, 16, id % 500 + 1), 0, 0)
    }
    Multimodal.decodeAudio(media).toDF().orderBy("media_id")
  }

  /** Video ISO-BMFF/MP4 metadata (operators.Multimodal.VideoHeaders) —
    * same contract as q_mm_dims/q_mm_audio: payloads are REAL
    * synthesized MP4 containers parameterized by doc_id, the engine
    * walks the box chain, the oracle recomputes the arithmetic. */
  private val video = QuerySpec(
    "q_mm_video",
    """SELECT doc_id AS media_id, 'mp4' AS format,
      |       CAST(doc_id % 640 + 16 AS INTEGER) AS width,
      |       CAST(doc_id % 360 + 16 AS INTEGER) AS height,
      |       CAST(CASE doc_id % 3 WHEN 0 THEN 600 WHEN 1 THEN 1000 ELSE 90000 END AS BIGINT) AS timescale,
      |       CAST((doc_id % 1000 + 1) * 1000 AS BIGINT) AS duration_ms
      |FROM documents ORDER BY media_id""".stripMargin) { (s, d) =>
    import s.implicits._
    val media = Tables.documents(s, d).select(col("doc_id")).as[Long].map { id =>
      val ts = (id % 3) match { case 0 => 600L; case 1 => 1000L; case _ => 90000L }
      Multimodal.MediaRecord(id, "video/mp4",
        Multimodal.VideoHeaders.syntheticMp4(
          (id % 640 + 16).toInt, (id % 360 + 16).toInt, ts, (id % 1000 + 1) * ts), 0, 0)
    }
    Multimodal.decodeVideo(media).toDF().orderBy("media_id")
  }

  /** WARC crawl-container records (operators.Multimodal.WarcHeaders) —
    * completes the container family with the format crawl corpora
    * actually arrive in: payloads are REAL synthesized WARC/1.0 files
    * (1 + doc_id%3 records each), the engine walks the record chain by
    * DECLARED Content-Length, and the oracle recomputes every field
    * and payload md5 from the same planted parameters. The first
    * record's payload embeds a decoy "WARC/1.0" + blank line, so a
    * parser that scans bytes instead of honoring Content-Length
    * fabricates records and breaks the hash. */
  private val warc = QuerySpec(
    "q_mm_warc",
    """WITH u AS (SELECT doc_id, source, CAST(doc_id AS VARCHAR) AS id FROM documents),
      |r AS (SELECT doc_id, source, id,
      |        unnest(range(0, 1 + doc_id % 3)) AS j FROM u),
      |p AS (SELECT doc_id AS media_id, j AS rec_idx,
      |        CASE (doc_id + j) % 3 WHEN 0 THEN 'response'
      |             WHEN 1 THEN 'request' ELSE 'metadata' END AS warc_type,
      |        'https://' || source || '.example.com/doc/' || id || '/' ||
      |          CAST(j AS VARCHAR) AS target_uri,
      |        CASE WHEN j = 0
      |             THEN 'payload ' || id || ' WARC/1.0' || chr(13) || chr(10) ||
      |                  chr(13) || chr(10) || 'decoy'
      |             ELSE 'payload ' || id || '-' || CAST(j AS VARCHAR) END AS payload
      |      FROM r)
      |SELECT media_id, rec_idx, warc_type, target_uri,
      |       CAST(length(payload) AS BIGINT) AS content_length,
      |       md5(payload) AS payload_md5
      |FROM p ORDER BY media_id, rec_idx""".stripMargin) { (s, d) =>
    import s.implicits._
    val media = Tables.documents(s, d)
      .select(col("doc_id"), col("source")).as[(Long, String)].map {
        case (id, src) =>
          val recs = (0 until (1 + id % 3).toInt).map { j =>
            val tpe = ((id + j) % 3) match {
              case 0 => "response"; case 1 => "request"; case _ => "metadata"
            }
            val payload =
              if (j == 0) s"payload $id WARC/1.0\r\n\r\ndecoy"
              else s"payload $id-$j"
            (tpe, s"https://$src.example.com/doc/$id/$j",
              payload.getBytes("UTF-8"))
          }
          Multimodal.MediaRecord(id, "application/warc",
            Multimodal.WarcHeaders.syntheticWarc(recs), 0, 0)
      }
    Multimodal.decodeWarc(media).toDF().orderBy("media_id", "rec_idx")
  }

  /** Perceptual image near-dup ([[graft.operators.ImageDedup]]) — the
    * first CONTENT-level multimodal dedup: Spark renders REAL images
    * (PNG at three scales + one JPEG recompression per group of 4
    * consecutive doc_ids, all variants of one md5-derived 8×8 block
    * pattern), recovers a 64-bit aHash FROM THE PIXELS, and pairs via
    * the 4×16-bit Hamming-banded join. The oracle plants the expected
    * hash by md5 arithmetic (same bytes, same big-endian hex read) and
    * replays the identical banding in SQL — so decode, box-downsample,
    * hash and blocking must ALL be right for the pair sets to meet.
    * The pair list is robust to ≤3 recompression bit flips by
    * construction (that is what the Hamming threshold is for), so the
    * gate certifies the mechanism, not a bit-for-bit pixel decoder. */
  /** Deterministic perceptual-pattern media set shared by the image
    * queries: groups of 4 consecutive doc_ids render one md5-derived
    * 8×8 block pattern as PNG ×3 scales + one JPEG recompression. */
  private def patternMedia(s: org.apache.spark.sql.SparkSession, d: String) = {
    import s.implicits._
    Tables.documents(s, d).select(col("doc_id")).as[Long].map { id =>
      val bits = graft.operators.ImageDedup.patternBits(id / 4)
      val v = (id % 4).toInt
      val payload = v match {
        case 0 => graft.operators.ImageDedup.renderPattern(bits, 8, jpeg = false)
        case 1 => graft.operators.ImageDedup.renderPattern(bits, 12, jpeg = false)
        case 2 => graft.operators.ImageDedup.renderPattern(bits, 5, jpeg = false)
        case _ => graft.operators.ImageDedup.renderPattern(bits, 8, jpeg = true)
      }
      Multimodal.MediaRecord(
        id, if (v == 3) "image/jpeg" else "image/png", payload, 0, 0)
    }
  }

  private val imageNearDup = QuerySpec(
    "q_mm_image_neardup",
    """WITH e AS (
      |  SELECT doc_id,
      |         ('0x' || substr(md5(CAST(doc_id // 4 AS VARCHAR)), 1, 16))::UBIGINT AS raw
      |  FROM documents),
      |h AS (SELECT doc_id,
      |             CASE WHEN bit_count(raw) IN (0, 64)
      |                  THEN 0::UBIGINT ELSE raw END AS ph
      |      FROM e),
      |d AS (SELECT DISTINCT ph FROM h),
      |cb AS (SELECT ph, chunk, (ph >> (chunk * 16)::INT) & 65535 AS chunkval
      |       FROM (SELECT ph, unnest(range(0, 4)) AS chunk FROM d)),
      |p AS (SELECT DISTINCT x.ph AS pha, y.ph AS phb
      |      FROM cb x JOIN cb y
      |        ON x.chunk = y.chunk AND x.chunkval = y.chunkval AND x.ph < y.ph
      |      WHERE bit_count(xor(x.ph, y.ph)) <= 3),
      |w AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id
      |      FROM h a JOIN h b ON a.ph = b.ph AND a.doc_id < b.doc_id),
      |x AS (SELECT least(a.doc_id, b.doc_id) AS a_id,
      |             greatest(a.doc_id, b.doc_id) AS b_id
      |      FROM p JOIN h a ON a.ph = p.pha JOIN h b ON b.ph = p.phb)
      |SELECT a_id, b_id FROM (SELECT * FROM w UNION ALL SELECT * FROM x)
      |ORDER BY a_id, b_id""".stripMargin) { (s, d) =>
    val hashes = graft.operators.ImageDedup.hashImages(patternMedia(s, d))
      .filter(_.decoded).toDF()
    graft.operators.ImageDedup
      .nearDupPairs(hashes, "media_id", "ahash", maxHamming = 3)
      .select(col("a_id"), col("b_id"))
      .orderBy("a_id", "b_id")
  }

  /** Image metadata scrub ([[graft.operators.ExifScrub]]): Spark
    * renders real PNG/JPEG images, SPLICES planted metadata into the
    * container (CRC-correct tEXt chunks / well-formed APP1+COM
    * segments whose sizes are pure doc_id arithmetic), scrubs, and
    * emits the audit row plus two in-band booleans — pixels decoded
    * from the scrubbed bytes equal the original's (they must: the
    * surgery never touches the entropy-coded data) and a re-scrub
    * finds zero metadata. The oracle recomputes every count and byte
    * total from the same planted arithmetic. */
  private val exifScrub = QuerySpec(
    "q_mm_exif_scrub",
    """SELECT doc_id AS media_id,
      |  CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS format,
      |  CAST(CASE WHEN doc_id % 2 = 0 THEN doc_id % 3
      |       ELSE 1 + CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END
      |       END AS BIGINT) AS n_meta,
      |  CAST(CASE WHEN doc_id % 2 = 0
      |       THEN (doc_id % 3) * (16 + doc_id % 7)
      |            + (doc_id % 3) * (doc_id % 3 - 1) // 2
      |       ELSE (doc_id % 50 + 4) + 10
      |            + CASE WHEN doc_id % 3 = 0
      |                   THEN 4 + length('comment ' || CAST(doc_id AS VARCHAR))
      |                   ELSE 0 END
      |       END AS BIGINT) AS bytes_removed,
      |  CAST(1 AS BIGINT) AS pixels_equal,
      |  CAST(1 AS BIGINT) AS meta_gone
      |FROM documents ORDER BY media_id""".stripMargin) { (s, d) =>
    import s.implicits._
    import graft.operators.{ExifScrub, ImageDedup}
    Tables.documents(s, d).select(col("doc_id")).as[Long].map { id =>
      val bits = ImageDedup.patternBits(id)
      val payload =
        if (id % 2 == 0) {
          val base = ImageDedup.renderPattern(bits, 2, jpeg = false)
          val n = (id % 3).toInt
          val chunks = (0 until n).map { j =>
            ExifScrub.syntheticTextChunk(
              s"k$j", "v" * ((id % 7).toInt + 1 + j))
          }
          ExifScrub.plantPngMeta(base, chunks)
        } else {
          val base = ImageDedup.renderPattern(bits, 2, jpeg = true)
          val segs = Seq(ExifScrub.syntheticApp1((id % 50 + 4).toInt)) ++
            (if (id % 3 == 0) Seq(ExifScrub.syntheticCom(s"comment $id"))
             else Nil)
          ExifScrub.plantJpegMeta(base, segs)
        }
      Multimodal.MediaRecord(
        id, if (id % 2 == 0) "image/png" else "image/jpeg", payload, 0, 0)
    }.mapPartitions { it =>
      it.map { r =>
        val sc = ExifScrub.scrubRecord(r)
        val eq = ExifScrub.pixelsEqual(r.payload, sc.payload)
        val gone = ExifScrub.scrubRecord(
          Multimodal.MediaRecord(r.media_id, r.kind, sc.payload, 0, 0))
          .n_meta == 0L
        (r.media_id, sc.format, sc.n_meta, sc.bytes_removed,
          if (eq) 1L else 0L, if (gone) 1L else 0L)
      }
    }.toDF("media_id", "format", "n_meta", "bytes_removed",
      "pixels_equal", "meta_gone")
      .orderBy("media_id")
  }

  /** Incremental perceptual-hash index
    * ([[graft.operators.ImageDedup]] index half — the nightly-shard
    * shape of N97, composing the N33/N39 ledger discipline with
    * content-level image dedup): batches 0 and 1 of the pattern
    * corpus seed/append a (media_id, phash) index (batch 1
    * REDELIVERED — the id anti-join must append nothing), then batch
    * 2 pairs against the STORED hashes through the bipartite 4×16-bit
    * chunk join — stored images are never reprocessed. The oracle
    * plants every hash by md5 arithmetic and replays the bipartite
    * banding; pair sets stay robust to ≤3 JPEG recompression bit
    * flips because each group carries exactly one JPEG variant. */
  private val imageIndex = QuerySpec(
    "q_mm_image_index",
    """WITH e AS (
      |  SELECT doc_id,
      |         ('0x' || substr(md5(CAST(doc_id // 4 AS VARCHAR)), 1, 16))::UBIGINT AS raw
      |  FROM documents),
      |h AS (SELECT doc_id,
      |             CASE WHEN bit_count(raw) IN (0, 64)
      |                  THEN 0::UBIGINT ELSE raw END AS ph
      |      FROM e),
      |nb AS (SELECT doc_id, ph FROM h WHERE doc_id % 3 = 2),
      |sb AS (SELECT doc_id, ph FROM h WHERE doc_id % 3 <> 2),
      |nc AS (SELECT ph, chunk, (ph >> (chunk * 16)::INT) & 65535 AS chunkval
      |       FROM (SELECT ph, unnest(range(0, 4)) AS chunk
      |             FROM (SELECT DISTINCT ph FROM nb))),
      |sc AS (SELECT ph, chunk, (ph >> (chunk * 16)::INT) & 65535 AS chunkval
      |       FROM (SELECT ph, unnest(range(0, 4)) AS chunk
      |             FROM (SELECT DISTINCT ph FROM sb))),
      |p AS (SELECT DISTINCT n.ph AS nh, s.ph AS sh
      |      FROM nc n JOIN sc s
      |        ON n.chunk = s.chunk AND n.chunkval = s.chunkval
      |      WHERE bit_count(xor(n.ph, s.ph)) <= 3)
      |SELECT nb.doc_id AS new_id, sb.doc_id AS stored_id
      |FROM p JOIN nb ON nb.ph = p.nh JOIN sb ON sb.ph = p.sh
      |ORDER BY new_id, stored_id""".stripMargin) { (s, d) =>
    import graft.operators.ImageDedup
    val hashes = ImageDedup.hashImages(patternMedia(s, d))
      .filter(_.decoded).toDF()
    def batch(i: Int) = hashes.filter(pmod(col("media_id"), lit(3)) === i)
    val root = graft.core.CacheGovernor.durableDir(s"image_hash_index:$d") { dir =>
      val path = s"$dir/v1"
      HashIndex.writeHashIndex(batch(0), "media_id", "ahash", path)
      HashIndex.appendToHashIndex(s, path, batch(1), "media_id", "ahash")
      // redelivered batch — the id anti-join must append nothing
      HashIndex.appendToHashIndex(s, path, batch(1), "media_id", "ahash")
      // compaction must be a verbatim copy — scoring reads v2
      HashIndex.compactHashIndex(s, path, s"$dir/v2")
    }
    HashIndex.nearDupAgainstIndex(s, s"$root/v2", batch(2), "media_id", "ahash")
      .select("new_id", "stored_id")
      .orderBy("new_id", "stored_id")
  }

  /** Perceptual audio near-dup ([[graft.operators.AudioDedup]] — the
    * PCM analogue of q_mm_image_neardup): groups of 4 consecutive
    * doc_ids render one md5-derived 64-window energy pattern as real
    * WAV clips at three sample rates and two gains; the engine
    * recovers the energy-envelope hash FROM THE SAMPLES and pairs via
    * the same 4×16-bit Hamming banding; the oracle plants the hash by
    * the same md5 arithmetic as the image twin (recovery is exact —
    * |amplitude| is constant per window — so the pair sets must meet
    * bit-for-bit). */
  private val audioNearDup = QuerySpec(
    "q_mm_audio_neardup",
    """WITH e AS (
      |  SELECT doc_id,
      |         ('0x' || substr(md5(CAST(doc_id // 4 AS VARCHAR)), 1, 16))::UBIGINT AS raw
      |  FROM documents),
      |h AS (SELECT doc_id,
      |             CASE WHEN bit_count(raw) IN (0, 64)
      |                  THEN 0::UBIGINT ELSE raw END AS ph
      |      FROM e),
      |d AS (SELECT DISTINCT ph FROM h),
      |cb AS (SELECT ph, chunk, (ph >> (chunk * 16)::INT) & 65535 AS chunkval
      |       FROM (SELECT ph, unnest(range(0, 4)) AS chunk FROM d)),
      |p AS (SELECT DISTINCT x.ph AS pha, y.ph AS phb
      |      FROM cb x JOIN cb y
      |        ON x.chunk = y.chunk AND x.chunkval = y.chunkval AND x.ph < y.ph
      |      WHERE bit_count(xor(x.ph, y.ph)) <= 3),
      |w AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id
      |      FROM h a JOIN h b ON a.ph = b.ph AND a.doc_id < b.doc_id),
      |x AS (SELECT least(a.doc_id, b.doc_id) AS a_id,
      |             greatest(a.doc_id, b.doc_id) AS b_id
      |      FROM p JOIN h a ON a.ph = p.pha JOIN h b ON b.ph = p.phb)
      |SELECT a_id, b_id FROM (SELECT * FROM w UNION ALL SELECT * FROM x)
      |ORDER BY a_id, b_id""".stripMargin) { (s, d) =>
    import graft.operators.{AudioDedup, ImageDedup}
    val hashes = AudioDedup.hashAudio(clipMedia(s, d)).filter(_.decoded).toDF()
    ImageDedup.nearDupPairs(hashes, "media_id", "ahash", maxHamming = 3)
      .select(col("a_id"), col("b_id"))
      .orderBy("a_id", "b_id")
  }

  /** Deterministic energy-pattern clip set shared by the audio
    * queries: groups of 4 consecutive doc_ids render one md5-derived
    * 64-window pattern as real WAV clips at three sample rates and
    * two gains (the audio analogue of [[patternMedia]]). */
  private def clipMedia(s: org.apache.spark.sql.SparkSession, d: String) = {
    import s.implicits._
    import graft.operators.{AudioDedup, ImageDedup}
    Tables.documents(s, d).select(col("doc_id")).as[Long].map { id =>
      val bits = ImageDedup.patternBits(id / 4)
      val payload = (id % 4).toInt match {
        case 0 => AudioDedup.renderClip(bits, 8000, 8000)
        case 1 => AudioDedup.renderClip(bits, 16000, 8000)
        case 2 => AudioDedup.renderClip(bits, 44100, 4000)
        case _ => AudioDedup.renderClip(bits, 8000, 2000)
      }
      Multimodal.MediaRecord(id, "audio/wav", payload, 0, 0)
    }
  }

  /** Incremental audio hash index — N103 composed with N101's ledger
    * discipline, proving the (media_id, 64-bit hash) index machinery
    * is modality-generic: batches 0 and 1 of the clip corpus
    * seed/append the index (batch 1 REDELIVERED — the id anti-join
    * must append nothing), then batch 2 pairs against STORED hashes
    * through the bipartite 4×16-bit chunk join without reprocessing
    * stored clips. Same oracle arithmetic as q_mm_image_index (the
    * energy-envelope recovery is exact, so the planted md5 hashes
    * replay bit-for-bit). */
  private val audioIndex = QuerySpec(
    "q_mm_audio_index",
    """WITH e AS (
      |  SELECT doc_id,
      |         ('0x' || substr(md5(CAST(doc_id // 4 AS VARCHAR)), 1, 16))::UBIGINT AS raw
      |  FROM documents),
      |h AS (SELECT doc_id,
      |             CASE WHEN bit_count(raw) IN (0, 64)
      |                  THEN 0::UBIGINT ELSE raw END AS ph
      |      FROM e),
      |nb AS (SELECT doc_id, ph FROM h WHERE doc_id % 3 = 2),
      |sb AS (SELECT doc_id, ph FROM h WHERE doc_id % 3 <> 2),
      |nc AS (SELECT ph, chunk, (ph >> (chunk * 16)::INT) & 65535 AS chunkval
      |       FROM (SELECT ph, unnest(range(0, 4)) AS chunk
      |             FROM (SELECT DISTINCT ph FROM nb))),
      |sc AS (SELECT ph, chunk, (ph >> (chunk * 16)::INT) & 65535 AS chunkval
      |       FROM (SELECT ph, unnest(range(0, 4)) AS chunk
      |             FROM (SELECT DISTINCT ph FROM sb))),
      |p AS (SELECT DISTINCT n.ph AS nh, s.ph AS sh
      |      FROM nc n JOIN sc s
      |        ON n.chunk = s.chunk AND n.chunkval = s.chunkval
      |      WHERE bit_count(xor(n.ph, s.ph)) <= 3)
      |SELECT nb.doc_id AS new_id, sb.doc_id AS stored_id
      |FROM p JOIN nb ON nb.ph = p.nh JOIN sb ON sb.ph = p.sh
      |ORDER BY new_id, stored_id""".stripMargin) { (s, d) =>
    import graft.operators.{AudioDedup, ImageDedup}
    val hashes = AudioDedup.hashAudio(clipMedia(s, d)).filter(_.decoded).toDF()
    def batch(i: Int) = hashes.filter(pmod(col("media_id"), lit(3)) === i)
    val root = graft.core.CacheGovernor.durableDir(s"audio_hash_index:$d") { dir =>
      val path = s"$dir/v1"
      HashIndex.writeHashIndex(batch(0), "media_id", "ahash", path)
      HashIndex.appendToHashIndex(s, path, batch(1), "media_id", "ahash")
      // redelivered batch — the id anti-join must append nothing
      HashIndex.appendToHashIndex(s, path, batch(1), "media_id", "ahash")
    }
    HashIndex.nearDupAgainstIndex(s, s"$root/v1", batch(2), "media_id", "ahash")
      .select("new_id", "stored_id")
      .orderBy("new_id", "stored_id")
  }

  /** Video content-level near-dup ([[graft.operators.VideoDedup]] —
    * closes the perceptual multimodal triple): every second group of 4
    * consecutive doc_ids renders one 4-scene md5-derived clip as four
    * REAL MP4 re-encodings (base, 2× frame rate at higher resolution,
    * JPEG recompression, 3× rate downscaled); the engine walks the
    * ISO-BMFF sample table, decodes only the 8 fractionally-sampled
    * frames, aHashes each, majority-votes per bit into one 64-bit
    * video hash, and pairs via the same 4×16-bit Hamming banding. The
    * oracle replays the whole construction — per-scene md5 hashes, the
    * degenerate-popcount rule, the 2-votes-per-scene majority (bit set
    * iff ≥3 of 4 scenes set it) and the banding — so the sample-table
    * walk, fractional sampler, frame decode and temporal aggregation
    * must ALL be right for the pair sets to meet. */
  private val videoNearDup = QuerySpec(
    "q_mm_video_neardup",
    """WITH docs AS (SELECT doc_id FROM documents WHERE (doc_id // 4) % 2 = 0),
      |s AS (SELECT doc_id, unnest(range(0, 4)) AS j FROM docs),
      |e AS (SELECT doc_id, j,
      |        ('0x' || substr(md5(CAST((doc_id // 4) * 4 + j AS VARCHAR)), 1, 16))::UBIGINT AS raw
      |      FROM s),
      |f AS (SELECT doc_id, j,
      |        CASE WHEN bit_count(raw) IN (0, 64) THEN 0::UBIGINT ELSE raw END AS fh
      |      FROM e),
      |bits AS (SELECT doc_id, unnest(range(0, 64)) AS bit FROM docs),
      |vb AS (SELECT f.doc_id, bits.bit,
      |         SUM(CASE WHEN (fh >> bit::INT) & 1 = 1 THEN 1 ELSE 0 END) AS c
      |       FROM f JOIN bits ON f.doc_id = bits.doc_id
      |       GROUP BY f.doc_id, bits.bit),
      |vh AS (SELECT doc_id,
      |         bit_or(CASE WHEN c >= 3 THEN (1::UBIGINT << bit::INT)
      |                ELSE 0::UBIGINT END) AS ph
      |       FROM vb GROUP BY doc_id),
      |d AS (SELECT DISTINCT ph FROM vh),
      |cb AS (SELECT ph, chunk, (ph >> (chunk * 16)::INT) & 65535 AS chunkval
      |       FROM (SELECT ph, unnest(range(0, 4)) AS chunk FROM d)),
      |p AS (SELECT DISTINCT x.ph AS pha, y.ph AS phb
      |      FROM cb x JOIN cb y
      |        ON x.chunk = y.chunk AND x.chunkval = y.chunkval AND x.ph < y.ph
      |      WHERE bit_count(xor(x.ph, y.ph)) <= 3),
      |w AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id
      |      FROM vh a JOIN vh b ON a.ph = b.ph AND a.doc_id < b.doc_id),
      |x AS (SELECT least(a.doc_id, b.doc_id) AS a_id,
      |             greatest(a.doc_id, b.doc_id) AS b_id
      |      FROM p JOIN vh a ON a.ph = p.pha JOIN vh b ON b.ph = p.phb)
      |SELECT a_id, b_id FROM (SELECT * FROM w UNION ALL SELECT * FROM x)
      |ORDER BY a_id, b_id""".stripMargin) { (s, d) =>
    import graft.operators.{ImageDedup, VideoDedup}
    val hashes = VideoDedup.hashVideos(videoMedia(s, d)).toDF()
    ImageDedup.nearDupPairs(hashes, "media_id", "ahash", maxHamming = 3)
      .select(col("a_id"), col("b_id"))
      .orderBy("a_id", "b_id")
  }

  /** Deterministic scene-pattern clip set shared by the video queries:
    * every second group of 4 consecutive doc_ids renders one 4-scene
    * md5-derived clip in four real MP4 re-encodings (base / 2× rate
    * higher-res / JPEG recompression / 3× rate downscaled). The
    * render+sample-decode pass dominates and documents is a small
    * ids-only scan with few input splits, so the heavy map spreads
    * across every core first (the shuffle moves only Longs). */
  private def videoMedia(s: org.apache.spark.sql.SparkSession, d: String) = {
    import s.implicits._
    import graft.operators.VideoDedup
    Tables.documents(s, d).select(col("doc_id"))
      .where(expr("(doc_id div 4) % 2 = 0"))
      .repartition(s.sparkContext.defaultParallelism).as[Long].map { id =>
        val g = id / 4
        val payload = (id % 4).toInt match {
          case 0 => VideoDedup.renderVideo(g, 4, 1, 8, jpeg = false)
          case 1 => VideoDedup.renderVideo(g, 4, 2, 10, jpeg = false)
          case 2 => VideoDedup.renderVideo(g, 4, 1, 8, jpeg = true)
          case _ => VideoDedup.renderVideo(g, 4, 3, 5, jpeg = false)
        }
        Multimodal.MediaRecord(id, "video/mp4", payload, 0, 0)
      }
  }

  /** Incremental video hash index — completes the (near-dup, index)
    * pair for all three perceptual modalities: the modality-generic
    * (media_id, hash) ledger over frame-sampled video hashes. Batches
    * 0/1 seed+append (batch 1 redelivered — no-op), batch 2 scores
    * bipartite against stored hashes without re-decoding stored
    * videos. Oracle replays the majority-vote video hash and the
    * bipartite banding from the scene-plant arithmetic. */
  private val videoIndex = QuerySpec(
    "q_mm_video_index",
    """WITH docs AS (SELECT doc_id FROM documents WHERE (doc_id // 4) % 2 = 0),
      |s AS (SELECT doc_id, unnest(range(0, 4)) AS j FROM docs),
      |e AS (SELECT doc_id, j,
      |        ('0x' || substr(md5(CAST((doc_id // 4) * 4 + j AS VARCHAR)), 1, 16))::UBIGINT AS raw
      |      FROM s),
      |f AS (SELECT doc_id, j,
      |        CASE WHEN bit_count(raw) IN (0, 64) THEN 0::UBIGINT ELSE raw END AS fh
      |      FROM e),
      |bits AS (SELECT doc_id, unnest(range(0, 64)) AS bit FROM docs),
      |vb AS (SELECT f.doc_id, bits.bit,
      |         SUM(CASE WHEN (fh >> bit::INT) & 1 = 1 THEN 1 ELSE 0 END) AS c
      |       FROM f JOIN bits ON f.doc_id = bits.doc_id
      |       GROUP BY f.doc_id, bits.bit),
      |vh AS (SELECT doc_id,
      |         bit_or(CASE WHEN c >= 3 THEN (1::UBIGINT << bit::INT)
      |                ELSE 0::UBIGINT END) AS ph
      |       FROM vb GROUP BY doc_id),
      |nb AS (SELECT doc_id, ph FROM vh WHERE doc_id % 3 = 2),
      |sb AS (SELECT doc_id, ph FROM vh WHERE doc_id % 3 <> 2),
      |nc AS (SELECT ph, chunk, (ph >> (chunk * 16)::INT) & 65535 AS chunkval
      |       FROM (SELECT ph, unnest(range(0, 4)) AS chunk
      |             FROM (SELECT DISTINCT ph FROM nb))),
      |sc AS (SELECT ph, chunk, (ph >> (chunk * 16)::INT) & 65535 AS chunkval
      |       FROM (SELECT ph, unnest(range(0, 4)) AS chunk
      |             FROM (SELECT DISTINCT ph FROM sb))),
      |p AS (SELECT DISTINCT n.ph AS nh, s.ph AS sh
      |      FROM nc n JOIN sc s
      |        ON n.chunk = s.chunk AND n.chunkval = s.chunkval
      |      WHERE bit_count(xor(n.ph, s.ph)) <= 3)
      |SELECT nb.doc_id AS new_id, sb.doc_id AS stored_id
      |FROM p JOIN nb ON nb.ph = p.nh JOIN sb ON sb.ph = p.sh
      |ORDER BY new_id, stored_id""".stripMargin) { (s, d) =>
    import graft.operators.{ImageDedup, VideoDedup}
    val hashes = VideoDedup.hashVideos(videoMedia(s, d))
      .filter(_.decoded).toDF()
    def batch(i: Int) = hashes.filter(pmod(col("media_id"), lit(3)) === i)
    val root = graft.core.CacheGovernor.durableDir(s"video_hash_index:$d") { dir =>
      val path = s"$dir/v1"
      HashIndex.writeHashIndex(batch(0), "media_id", "ahash", path)
      HashIndex.appendToHashIndex(s, path, batch(1), "media_id", "ahash")
      // redelivered batch — the id anti-join must append nothing
      HashIndex.appendToHashIndex(s, path, batch(1), "media_id", "ahash")
    }
    HashIndex.nearDupAgainstIndex(s, s"$root/v1", batch(2), "media_id", "ahash")
      .select("new_id", "stored_id")
      .orderBy("new_id", "stored_id")
  }

  val all: Seq[QuerySpec] = Seq(features, chunks, dims, audio, video, warc,
    imageNearDup, exifScrub, imageIndex, audioNearDup, audioIndex,
    videoNearDup, videoIndex)
}
