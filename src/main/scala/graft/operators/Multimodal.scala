package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Multimodal column handling (north-star): opaque `binary` payloads with
  * typed metadata, chunked transfer, and partition-local feature
  * extraction.
  *
  * The reference streams objects as fixed-size chunks
  * (/root/reference/worker/src/h2_service.rs:89-126, 128-byte demo chunks;
  * /root/reference/common/src/settings/local_kv_options.rs:24, 128 KiB
  * configured) and reassembles on the client
  * (/root/reference/client/src/main.rs:92-94). Here that becomes: binary
  * column → posexploded chunk rows → order-preserving reassembly — all
  * inside Spark expressions, no driver round-trip.
  *
  * Real image/audio decode libraries are absent from this container, so
  * [[MultimodalExtract]] stubs the decode behind a deterministic fake
  * while keeping the Spark-side plumbing (schema, batching, partition
  * mapping) real and tested.
  */
object Multimodal {
  val ChunkSize = 128 // bytes — the reference's demo chunk size

  /** Chunk → reassemble round-trip: encode text to binary, split into
    * 128-byte chunks (chunk rows, as a streaming transfer would produce),
    * reassemble in chunk order, and emit the md5 of the rebuilt payload.
    * The oracle computes md5(text) directly — equal digests prove the
    * chunk plumbing is lossless and order-correct. */
  val qBinaryRoundtrip = QueryDef.sql(
    "q_binary_chunk_roundtrip",
    """SELECT doc_id, md5(text) AS digest
      |FROM documents
      |ORDER BY doc_id""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    val bin = encode($"text", "UTF-8")
    val nChunks = ceil(length(bin) / lit(ChunkSize.toDouble)).cast("int")
    val chunks = Tables
      .documents(s, d)
      .select(
        $"doc_id",
        posexplode(
          transform(
            sequence(lit(0), nChunks - 1),
            i => bin.substr(i * ChunkSize + 1, lit(ChunkSize))))
          .as(Seq("chunk_id", "chunk")))
    // reassemble: collect chunks per doc, sort by chunk_id, binary-concat
    chunks
      .groupBy($"doc_id")
      .agg(sort_array(collect_list(struct($"chunk_id", $"chunk"))).as("parts"))
      .select(
        $"doc_id",
        md5(
          aggregate(
            transform($"parts", p => p.getField("chunk")),
            lit(Array.emptyByteArray),
            (acc, c) => concat(acc, c))).as("digest"))
      .orderBy($"doc_id")
  }

  /** Typed multimodal record after "decode". Features ride as an exact
    * integer vector stringified to CSV — list-typed result columns crash
    * the harness's pandas compare, and integer frame sums (unlike float
    * means) round-trip identically through every engine. */
  case class MediaFeatures(
      doc_id: Long,
      n_bytes: Int,
      n_frames: Int,
      checksum: Long,
      features_csv: String)

  /** Partition-local feature extraction over binary payloads via
    * mapPartitions (the Scala analog of mapInPandas batch UDFs): each
    * partition iterates its rows once, "decodes" the payload, and emits a
    * fixed-width feature row.
    *
    * STUB: the frame-sum "decode" stands in for a real image/audio decoder
    * (libs not in this container) — deterministic so the DuckDB oracle can
    * recompute it from the source text. The schema, batch iteration, and
    * partitioning are the real scale path. */
  val qMediaFeatures = QueryDef.sql(
    "q_media_features",
    """SELECT doc_id,
      |       CAST(n_chars AS INT) AS n_bytes,
      |       CAST((n_chars + 31) // 32 AS INT) AS n_frames,
      |       CAST(COALESCE(list_sum([(ord(text[i:i]) * i) % 1000000007
      |                      for i in range(1, CAST(n_chars AS INT) + 1)]), 0)
      |            % 1000000007 AS BIGINT) AS checksum,
      |       COALESCE(list_aggregate(
      |         [CAST(list_sum([ord(ch)
      |                         for ch in str_split(substr(text, f * 32 + 1, 32), '')])
      |               AS VARCHAR)
      |          for f in range(0, CAST(least((n_chars + 31) // 32, 8) AS INT))],
      |         'string_agg', ','), '') AS features_csv
      |FROM documents
      |ORDER BY doc_id""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    val frame = 32 // pretend frame size in bytes (frame-sampling analog)
    Tables
      .documents(s, d)
      .select($"doc_id", encode($"text", "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val nFrames = (bytes.length + frame - 1) / frame
          // deterministic fake decode: per-frame byte-sum feature vector
          val feats = Array.tabulate(nFrames.min(8)) { f =>
            bytes.slice(f * frame, (f + 1) * frame).map(_ & 0xff).sum.toLong
          }
          // positional polynomial checksum, SQL-expressible; per-term mod
          // keeps the running Long sum exact until ~9e9 bytes/payload
          // ((Σaᵢ) mod P ≡ (Σ(aᵢ mod P)) mod P, and DuckDB's HUGEINT side
          // is exact regardless)
          val checksum = bytes.zipWithIndex
            .map { case (b, i) => (b & 0xff).toLong * (i + 1) % 1000000007L }
            .sum % 1000000007L
          MediaFeatures(id, bytes.length, nFrames, checksum, feats.mkString(","))
        }
      }
      .toDF()
      .select($"doc_id", $"n_bytes", $"n_frames", $"checksum", $"features_csv")
      .orderBy($"doc_id")
  }

  /** Frame sampling: treat the payload as fixed 32-byte frames, keep
    * every 3rd frame, digest the sampled stream. The documents are
    * ASCII, so byte frames == char frames and DuckDB can replicate the
    * exact sampling with substr arithmetic — the frame-selection
    * plumbing (offsets, stride, tail handling) is oracle-checked. */
  val qFrameSample = QueryDef.sql(
    "q_media_frame_sample",
    """WITH f AS (
      |  SELECT doc_id, n_chars,
      |         (n_chars + 31) // 32 AS n_frames,
      |         list_aggregate(
      |           [substr(text, CAST(i * 32 + 1 AS INT), 32)
      |            for i in range(0, CAST((n_chars + 31) // 32 AS INT))
      |            if i % 3 = 0],
      |           'string_agg', '') AS sampled
      |  FROM documents)
      |SELECT doc_id,
      |       CAST(n_frames AS INT)                          AS n_frames,
      |       CAST((n_frames + 2) // 3 AS INT)               AS n_sampled,
      |       md5(sampled)                                   AS sample_digest
      |FROM f
      |ORDER BY doc_id""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    val nFrames = ceil(length($"text") / lit(32.0)).cast("int")
    Tables
      .documents(s, d)
      .withColumn("n_frames", nFrames)
      .withColumn(
        "sampled",
        array_join(
          transform(
            filter(sequence(lit(0), $"n_frames" - 1), i => i % 3 === 0),
            i => $"text".substr(i * 32 + 1, lit(32))),
          ""))
      .select($"doc_id", $"n_frames",
        (($"n_frames" + 2) / 3).cast("int").as("n_sampled"),
        md5($"sampled").as("sample_digest"))
      .orderBy($"doc_id")
  }

  /** Typed media metadata: binary payload + a metadata struct (format,
    * byte count, frame count), filtered and projected by nested field —
    * the "opaque binary with typed metadata" column pattern. */
  val qMediaMeta = QueryDef.sql(
    "q_media_meta",
    """WITH m AS (
      |  SELECT doc_id,
      |         struct_pack(
      |           format := CASE doc_id % 3 WHEN 0 THEN 'png'
      |                     WHEN 1 THEN 'wav' ELSE 'mp4' END,
      |           n_bytes := n_chars,
      |           n_frames := (n_chars + 31) // 32) AS meta
      |  FROM documents)
      |SELECT doc_id, m.meta.format AS format,
      |       CAST(m.meta.n_bytes AS BIGINT)  AS n_bytes,
      |       CAST(m.meta.n_frames AS BIGINT) AS n_frames
      |FROM m
      |WHERE m.meta.format <> 'mp4' AND m.meta.n_frames > 10
      |ORDER BY doc_id""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    Tables
      .documents(s, d)
      .select(
        $"doc_id",
        struct(
          when($"doc_id" % 3 === 0, "png")
            .when($"doc_id" % 3 === 1, "wav")
            .otherwise("mp4").as("format"),
          $"n_chars".as("n_bytes"),
          floor(($"n_chars" + 31) / 32).cast("long").as("n_frames"))
          .as("meta"))
      .filter($"meta.format" =!= "mp4" && $"meta.n_frames" > 10)
      .select($"doc_id", $"meta.format".as("format"),
        $"meta.n_bytes".as("n_bytes"), $"meta.n_frames".as("n_frames"))
      .orderBy($"doc_id")
  }

  /** Resize stub: partition-local "downsample" keeping every 4th byte —
    * the mapPartitions plumbing for a real resize kernel (schema in/out,
    * byte budget shrink), decoder stubbed per the container limits. The
    * resized payload leaves the kernel as bytes; the query emits its md5
    * so DuckDB (which can rebuild the same every-4th-char string from the
    * ASCII source text) hash-checks the whole kernel path. */
  val qMediaResize = QueryDef.sql(
    "q_media_resize",
    """SELECT doc_id,
      |       CAST(n_chars AS INT) AS orig_bytes,
      |       CAST((n_chars + 3) // 4 AS INT) AS resized_bytes,
      |       md5(COALESCE(list_aggregate(
      |         [text[i:i] for i in range(1, CAST(n_chars AS INT) + 1)
      |          if (i - 1) % 4 = 0],
      |         'string_agg', ''), '')) AS resized_digest
      |FROM documents
      |ORDER BY doc_id""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    Tables
      .documents(s, d)
      .select($"doc_id", encode($"text", "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val resized = bytes.grouped(4).map(_.head).toArray // stub kernel
          (id, bytes.length, resized.length, resized)
        }
      }
      .toDF("doc_id", "orig_bytes", "resized_bytes", "resized")
      .select($"doc_id", $"orig_bytes", $"resized_bytes",
        md5($"resized").as("resized_digest"))
      .orderBy($"doc_id")
  }

  def defs: Seq[QueryDef] =
    Seq(qBinaryRoundtrip, qMediaFeatures, qFrameSample, qMediaMeta,
      qMediaResize)
}
