package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Multimodal-column plumbing: media payloads travel as opaque
  * `binary` columns with typed metadata alongside; decode /
  * feature-extract runs per-partition in bounded batches (the shape a
  * vectorized decode layer needs). The decode itself is a clearly
  * marked deterministic STUB — the real codecs are not in this
  * container — but the Spark-side contract (schema, batching,
  * partitioning, failure isolation) is real and tested.
  *
  * Scale posture: payload bytes stay columnar and are never collected;
  * feature extraction is a narrow mapPartitions (no shuffle); batch
  * size bounds per-task peak memory independent of partition size.
  * The decode output and the banded pHash candidate pairs are
  * persisted per corpus fingerprint ([[MmIndex]]) — a production
  * pipeline decodes each payload once and every downstream planner
  * reads the feature store, never the decoder.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, kind: String, payload: Array[Byte])

  final case class MediaFeatures(doc_id: Long, kind: String,
                                 byte_len: Int, width: Int, height: Int,
                                 n_frames: Int, checksum: Long)

  /** STUB decoder: deterministic pseudo-features from the payload
    * bytes. A real deployment replaces this with an image/audio codec
    * call; the signature (bytes in, fixed-width features out, pure,
    * batch-safe) is the contract the pipeline depends on. */
  def stubDecode(row: MediaRow): MediaFeatures = {
    val bytes = row.payload
    val len = bytes.length
    var sum = 0L
    var i = 0
    while (i < len) { sum = sum * 31 + (bytes(i) & 0xff); i += 1 }
    MediaFeatures(row.doc_id, row.kind, len,
      width = 16 + math.abs((sum % 1024).toInt),
      height = 16 + math.abs(((sum >> 10) % 1024).toInt),
      n_frames = if (row.kind == "video") 1 + (len % 32) else 1,
      checksum = sum)
  }

  /** Batched per-partition decode: bounded batches keep peak memory
    * independent of partition size (the mapInPandas/Arrow batch shape,
    * expressed Scala-side). */
  def decodeFeatures(media: Dataset[MediaRow], batchSize: Int = 64)
      : Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.map(stubDecode)
      }
    }
  }

  /** Documents → media table: payload = UTF-8 bytes standing in for
    * image/audio content; kind derived deterministically. */
  def mediaFromDocuments(s: SparkSession, d: String): Dataset[MediaRow] = {
    import s.implicits._
    Tables.documents(s, d)
      .select($"doc_id",
        element_at(array(lit("image"), lit("audio"), lit("video")),
          ($"doc_id" % 3 + 1).cast("int")).as("kind"),
        encode($"text", "UTF-8").as("payload"))
      .as[MediaRow]
  }

  val all: Seq[Q] = Seq(
    // ------------------------------------------------------------------
    // Binary-column metadata: byte length + content hash + kind —
    // pure SQL surface, DuckDB-verified.
    Q("mm_binary_meta",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d).select(
          $"doc_id",
          element_at(array(lit("image"), lit("audio"), lit("video")),
            ($"doc_id" % 3 + 1).cast("int")).as("kind"),
          octet_length(encode($"text", "UTF-8")).as("byte_len"),
          md5(encode($"text", "UTF-8")).as("content_hash"))
      },
      Some("""SELECT doc_id,
        ['image', 'audio', 'video'][CAST(doc_id % 3 AS INT) + 1] AS kind,
        octet_length(encode(text)) AS byte_len,
        md5(text) AS content_hash
        FROM documents""")),

    // ------------------------------------------------------------------
    // Stubbed decode through the batched mapPartitions path. The stub
    // is deterministic (payload bytes are the document text), so the
    // oracle replays it: the wrapping-Long rolling hash
    // h' = h*31 + byte is emulated as HUGEINT arithmetic mod 2⁶⁴ via
    // list_reduce, re-signed, with Scala's arithmetic >> 10 spelled
    // as floor division (DuckDB `//` truncates toward zero, so the
    // negative arm is -((-s + 1023) // 1024)). Byte-exact across all
    // columns including negative overflowed checksums — the decode
    // plumbing itself is what's under test; determinism is also
    // pinned by MultimodalSpec.
    Q("mm_decode_features",
      (s, d) => MmIndex.features(s, d),
      Some("""WITH decoded AS (
          SELECT doc_id,
            (['image','audio','video'])[CAST(doc_id % 3 AS INT) + 1] AS kind,
            octet_length(encode(text)) AS byte_len,
            list_reduce(
              list_prepend(CAST(0 AS HUGEINT),
                list_transform(generate_series(1, length(text)),
                  i -> CAST(ord(substr(text, i, 1)) AS HUGEINT))),
              (h, b) -> (h * 31 + b) % 18446744073709551616) AS hu
          FROM documents),
        signed AS (
          SELECT *, CASE WHEN hu >= 9223372036854775808
                         THEN hu - 18446744073709551616 ELSE hu END AS s
          FROM decoded)
        SELECT doc_id, kind, CAST(byte_len AS BIGINT) AS byte_len,
          CAST(16 + abs(s % 1024) AS BIGINT) AS width,
          CAST(16 + abs((CASE WHEN s >= 0 THEN s // 1024
                ELSE -((-s + 1023) // 1024) END) % 1024) AS BIGINT)
            AS height,
          CAST(CASE WHEN kind = 'video' THEN 1 + byte_len % 32
               ELSE 1 END AS BIGINT) AS n_frames,
          CAST(s AS BIGINT) AS checksum
        FROM signed""")),

    // ------------------------------------------------------------------
    // Frame sampling: every 4th frame index of each video payload,
    // through the real decode path (metadata from the batched stub
    // decode, frames via sequence+explode — a narrow generator, no
    // shuffle; per-row output is bounded by n_frames/stride). The
    // oracle reconstructs n_frames from the payload length because the
    // stub derives it deterministically (1 + byte_len % 32).
    Q("mm_frame_sample",
      (s, d) => {
        import s.implicits._
        MmIndex.features(s, d)
          .filter($"kind" === "video")
          .select($"doc_id", $"n_frames".cast("long").as("n_frames"),
            explode(sequence(lit(0L), $"n_frames".cast("long") - 1, lit(4L)))
              .as("frame_idx"))
      },
      Some("""SELECT doc_id, n_frames,
          unnest(generate_series(0, n_frames - 1, 4)) AS frame_idx
        FROM (SELECT doc_id,
                1 + octet_length(encode(text)) % 32 AS n_frames
              FROM documents WHERE doc_id % 3 = 2) x""")),

    // ------------------------------------------------------------------
    // Resize planning through the decode path: image rows flow through
    // the batched stub decode, then each source frame (dims derived
    // from byte_len — the oracle reconstructs them from octet_length,
    // like mm_frame_sample's n_frames) is fitted into a 224×224 box
    // preserving aspect ratio. The geometry math (min-scale, floor,
    // 1-pixel floor) is the real resize contract a codec UDF plugs
    // into; output bytes estimated at RGB24. Narrow map end-to-end —
    // no shuffle, payloads never leave their partition.
    Q("mm_resize_plan",
      (s, d) => {
        import s.implicits._
        MmIndex.features(s, d)
          .filter($"kind" === "image")
          .select($"doc_id",
            (lit(16L) + $"byte_len".cast("long") % 1024).as("src_w"),
            (lit(16L) + ($"byte_len".cast("long") / 7).cast("long") % 1024)
              .as("src_h"))
          // the limiting (larger) dimension lands on exactly 224 —
          // floor(src * (224.0/src)) rounds to 223 for ~9% of sizes
          // under IEEE division, which a real codec resize never does
          .select($"doc_id", $"src_w", $"src_h",
            when($"src_w" >= $"src_h", lit(224L))
              .otherwise(greatest(lit(1L),
                floor($"src_w" * lit(224.0) / $"src_h"))).as("out_w"),
            when($"src_h" >= $"src_w", lit(224L))
              .otherwise(greatest(lit(1L),
                floor($"src_h" * lit(224.0) / $"src_w"))).as("out_h"))
          .withColumn("out_bytes", $"out_w" * $"out_h" * 3)
      },
      Some("""SELECT doc_id, src_w, src_h, out_w, out_h,
          out_w * out_h * 3 AS out_bytes
        FROM (SELECT doc_id, src_w, src_h,
                CASE WHEN src_w >= src_h THEN 224
                     ELSE greatest(1, CAST(floor(src_w * 224.0 / src_h)
                       AS BIGINT)) END AS out_w,
                CASE WHEN src_h >= src_w THEN 224
                     ELSE greatest(1, CAST(floor(src_h * 224.0 / src_w)
                       AS BIGINT)) END AS out_h
              FROM (SELECT doc_id,
                      16 + octet_length(encode(text)) % 1024 AS src_w,
                      16 + (octet_length(encode(text)) // 7) % 1024 AS src_h
                    FROM documents WHERE doc_id % 3 = 0) x) y""")),

    // ------------------------------------------------------------------
    // Export shard manifest: greedy byte-budget bin packing of media
    // payloads into ~64 KB shards per modality (the WebDataset/
    // tfrecord export planning step). shard = exclusive-prefix-bytes
    // div budget — pure integer arithmetic over ONE window per kind;
    // items crossing a boundary start the next shard (standard
    // streaming bin-pack: shards may overflow by < one item). The
    // manifest is tiny metadata; payload bytes never move — writers
    // later stream each (kind, shard) group directly to its object.
    Q("mm_shard_manifest",
      (s, d) => {
        import s.implicits._
        val target = 65536L
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"kind").orderBy($"doc_id")
        val wPrev = w.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
        mediaFromDocuments(s, d).toDF()
          .select($"doc_id", $"kind",
            octet_length($"payload").cast("long").as("byte_len"))
          .withColumn("prev_bytes",
            coalesce(sum($"byte_len").over(wPrev), lit(0L)))
          .withColumn("shard_id", expr(s"prev_bytes div ${target}L"))
          .withColumn("pos_in_kind", row_number().over(w).cast("long"))
          .select($"doc_id", $"kind", $"byte_len", $"shard_id",
            $"pos_in_kind")
      },
      Some("""WITH media AS (
          SELECT doc_id,
            (['image', 'audio', 'video'])[CAST(doc_id % 3 + 1 AS INTEGER)]
              AS kind,
            CAST(octet_length(encode(text)) AS BIGINT) AS byte_len
          FROM documents)
        SELECT doc_id, kind, byte_len,
          CAST(COALESCE(SUM(byte_len) OVER (PARTITION BY kind ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            // 65536 AS BIGINT) AS shard_id,
          ROW_NUMBER() OVER (PARTITION BY kind ORDER BY doc_id)
            AS pos_in_kind
        FROM media""")),

    // ------------------------------------------------------------------
    // Audio STFT frame planning through the batched decode path: each
    // audio row's (sample_rate, n_samples) — derived deterministically
    // from the payload length, where a real codec reads the header —
    // is expanded into 25 ms windows on a 10 ms hop (the standard
    // speech-feature framing). Frame length/hop are integer-derived
    // from the rate (22050 → 551/220 by truncating division on BOTH
    // engines), boundaries come from one sequence() generator — a
    // narrow map + explode, no shuffle; payload bytes never move.
    Q("mm_audio_windows",
      (s, d) => {
        import s.implicits._
        MmIndex.features(s, d)
          .filter($"kind" === "audio")
          .select($"doc_id",
            element_at(
              array(lit(8000L), lit(16000L), lit(22050L), lit(44100L)),
              ($"byte_len" % 4 + 1).cast("int")).as("sr"),
            ($"byte_len".cast("long") * 64).as("n_samples"))
          .withColumn("flen", expr("sr * 25 div 1000"))
          .withColumn("hop", expr("sr * 10 div 1000"))
          .withColumn("n_frames",
            when($"n_samples" >= $"flen",
              lit(1L) + expr("(n_samples - flen) div hop"))
              .otherwise(lit(0L)))
          .filter($"n_frames" > 0)
          .select($"doc_id", $"sr", $"n_samples", $"n_frames", $"flen",
            $"hop",
            explode(sequence(lit(0L), $"n_frames" - 1)).as("frame_idx"))
          .select($"doc_id", $"sr", $"n_samples", $"n_frames", $"frame_idx",
            ($"frame_idx" * $"hop").as("start_sample"),
            ($"frame_idx" * $"hop" + $"flen").as("end_sample"))
      },
      Some("""WITH audio AS (
          SELECT doc_id,
            ([8000, 16000, 22050, 44100])[
              CAST(octet_length(encode(text)) % 4 + 1 AS INTEGER)]
              AS sr,
            CAST(octet_length(encode(text)) AS BIGINT) * 64 AS n_samples
          FROM documents WHERE doc_id % 3 = 1),
        framed AS (
          SELECT doc_id, sr, n_samples,
            sr * 25 // 1000 AS flen, sr * 10 // 1000 AS hop,
            CASE WHEN n_samples >= sr * 25 // 1000
                 THEN 1 + (n_samples - sr * 25 // 1000) // (sr * 10 // 1000)
                 ELSE 0 END AS n_frames
          FROM audio)
        SELECT doc_id, CAST(sr AS BIGINT) AS sr, n_samples, n_frames,
          unnest(generate_series(0, n_frames - 1)) AS frame_idx,
          unnest(generate_series(0, n_frames - 1)) * hop AS start_sample,
          unnest(generate_series(0, n_frames - 1)) * hop + flen
            AS end_sample
        FROM framed WHERE n_frames > 0"""))
  ,
    // ------------------------------------------------------------------
    // Scene-cut detection through the batched decode path: per video
    // frame, a STUB signature (one text codepoint sampled at a
    // deterministic payload position — a real codec emits a frame
    // histogram here) and a cut wherever the signature jumps by > 16
    // against the previous frame. Frame count comes from the real
    // decodeFeatures stub; the oracle reconstructs it from the
    // payload length. Per-doc lag window rides the doc_id equi-join
    // partitioning; output is one row per video.
    Q("mm_scene_cuts",
      (s, d) => {
        import s.implicits._
        val W = org.apache.spark.sql.expressions.Window
          .partitionBy($"doc_id").orderBy($"frame_idx")
        MmIndex.features(s, d)
          .filter($"kind" === "video")
          .select($"doc_id", $"n_frames".cast("long").as("n_frames"))
          .join(Tables.documents(s, d).select($"doc_id", $"text"), "doc_id")
          .select($"doc_id", $"n_frames", $"text",
            explode(sequence(lit(0L), $"n_frames" - 1)).as("frame_idx"))
          .withColumn("pos",
            ($"frame_idx" * 37) % greatest(length($"text"), lit(1)))
          .withColumn("sig",
            expr("ascii(substring(text, cast(pos + 1 as int), 1))"))
          .withColumn("cut",
            when($"frame_idx" > 0 &&
              abs($"sig" - lag($"sig", 1).over(W)) > 16, 1L)
              .otherwise(0L))
          .groupBy($"doc_id")
          .agg(min($"n_frames").as("n_frames"),
            sum($"cut").as("n_cuts"),
            min(when($"cut" === 1, $"frame_idx")).as("first_cut"))
      },
      Some("""WITH vids AS (
          SELECT doc_id, text,
            CAST(1 + octet_length(encode(text)) % 32 AS BIGINT) AS n_frames
          FROM documents WHERE doc_id % 3 = 2),
        frames AS (
          SELECT doc_id, n_frames, text,
            unnest(generate_series(0, n_frames - 1)) AS frame_idx
          FROM vids),
        sigs AS (
          SELECT doc_id, n_frames, frame_idx,
            ascii(substr(text,
              CAST((frame_idx * 37) % greatest(length(text), 1) + 1
                   AS INT), 1)) AS sig
          FROM frames),
        flagged AS (
          SELECT doc_id, n_frames, frame_idx,
            CASE WHEN frame_idx > 0 AND abs(sig - LAG(sig) OVER (
                   PARTITION BY doc_id ORDER BY frame_idx)) > 16
                 THEN 1 ELSE 0 END AS cut
          FROM sigs)
        SELECT doc_id, MIN(n_frames) AS n_frames,
          CAST(SUM(cut) AS BIGINT) AS n_cuts,
          MIN(CASE WHEN cut = 1 THEN frame_idx END) AS first_cut
        FROM flagged GROUP BY doc_id"""))
  )

  /** Banded 16-bit stub-pHash candidate pairs shared by
    * `mm_phash_hamming` and `mm_dedup_verdict`: the hash splits into
    * 4 nibble bands, candidates come from per-(kind, band, value)
    * self-joins — the pigeonhole guarantee that hamming ≤ 3 over 16
    * bits leaves at least one band identical, so banding loses no
    * true pair while the join stays bucket-local at any corpus size.
    * Band values are md5 nibbles and thus never NULL — the all-NULL
    * bucket weld the lexical LSH path filters against cannot arise. */
  private[ext] def phashPairs(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val alphabet = "0123456789abcdef"
    val hashed = Tables.documents(s, d).select(
      $"doc_id",
      element_at(array(lit("image"), lit("audio"), lit("video")),
        ($"doc_id" % 3 + 1).cast("int")).as("kind"),
      md5(encode($"text", "UTF-8")).as("h"))
    val withPh = hashed.selectExpr("doc_id", "kind",
      s"""CAST((instr('$alphabet', substr(h, 1, 1)) - 1) * 4096 +
               (instr('$alphabet', substr(h, 2, 1)) - 1) * 256 +
               (instr('$alphabet', substr(h, 3, 1)) - 1) * 16 +
               (instr('$alphabet', substr(h, 4, 1)) - 1) AS BIGINT) AS ph""",
      "substr(h, 1, 4) AS nibs")
    val bands = withPh.select($"doc_id", $"kind", $"ph",
      posexplode(split($"nibs", "(?!^)"))) // one row per nibble char
      .toDF("doc_id", "kind", "ph", "band_idx", "band_val")
    bands.as("a")
      .join(bands.as("b"),
        $"a.kind" === $"b.kind" && $"a.band_idx" === $"b.band_idx" &&
        $"a.band_val" === $"b.band_val" && $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"),
        $"a.ph".as("ph_a"), $"b.ph".as("ph_b"))
      .distinct()
  }

  /** Oracle CTE mirroring the stub pHash (quadratic pair form — the
    * banded plan is pigeonhole-equal). */
  private val phSql: String =
    """ph AS (
        SELECT doc_id,
          ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS kind,
          CAST((strpos('0123456789abcdef', substr(md5(text), 1, 1)) - 1) * 4096 +
               (strpos('0123456789abcdef', substr(md5(text), 2, 1)) - 1) * 256 +
               (strpos('0123456789abcdef', substr(md5(text), 3, 1)) - 1) * 16 +
               (strpos('0123456789abcdef', substr(md5(text), 4, 1)) - 1)
            AS BIGINT) AS ph
        FROM documents)"""

  val all2: Seq[Q] = Seq(
    // ------------------------------------------------------------------
    // Perceptual-hash near-duplicate pairs: a 16-bit stub pHash per
    // payload (4 md5 nibbles standing in for the DCT hash a real
    // image decoder would emit — the banding/pairing plumbing is the
    // real artifact), candidate pairs generated by SPLITTING the
    // hash into 4 nibble bands and self-joining per (kind, band,
    // value) — the pigeonhole guarantee: hamming ≤ 3 over 16 bits
    // forces at least one of 4 bands identical, so banding loses no
    // true pair while replacing the O(n²)-per-kind cross join with
    // bucket-local joins that shuffle-hash at any corpus size. The
    // oracle is the direct quadratic join — tractable at oracle
    // scale, and pigeonhole-equal to the banded plan. Hamming
    // distance is bit_count(xor) on integers: exact cross-engine.
    Q("mm_phash_hamming",
      (s, d) => {
        import s.implicits._
        // the stored frame IS the verified (hamming <= 3) pair set
        MmIndex.phpairs(s, d)
          .select($"doc_a", $"doc_b", $"hamming")
      },
      Some(s"""WITH $phSql
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          CAST(bit_count(xor(a.ph, b.ph)) AS BIGINT) AS hamming
        FROM ph a JOIN ph b ON a.kind = b.kind AND a.doc_id < b.doc_id
        WHERE bit_count(xor(a.ph, b.ph)) <= 3""")),

    // ------------------------------------------------------------------
    // Modality × language balance sheet: the pre-training mixture
    // report a multimodal shard planner starts from — per (kind,
    // lang): document count, total/max payload bytes and the median
    // payload size via percentile_disc (selects a STORED integer —
    // the zero-IEEE-caveat percentile form). One scan, one
    // aggregation; byte lengths are exact integers from the binary
    // payload column.
    Q("mm_modality_balance",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d)
          .select($"doc_id", $"lang",
            element_at(array(lit("image"), lit("audio"), lit("video")),
              ($"doc_id" % 3 + 1).cast("int")).as("kind"),
            octet_length(encode($"text", "UTF-8")).cast("long")
              .as("byte_len"))
          .createOrReplaceTempView("media_meta")
        s.sql("""SELECT kind, lang, COUNT(*) AS n_docs,
            SUM(byte_len) AS total_bytes, MAX(byte_len) AS max_bytes,
            CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY byte_len)
              AS BIGINT) AS p50_bytes
          FROM media_meta GROUP BY kind, lang""")
      },
      Some("""SELECT
          ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS kind,
          lang, COUNT(*) AS n_docs,
          CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
          CAST(MAX(octet_length(encode(text))) AS BIGINT) AS max_bytes,
          percentile_disc(0.5) WITHIN GROUP (
            ORDER BY CAST(octet_length(encode(text)) AS BIGINT)) AS p50_bytes
        FROM documents GROUP BY 1, 2""")),

    // ------------------------------------------------------------------
    // Multimodal dedup verdict — the pHash counterpart of
    // dedup_verdict / sim_semantic_verdict, completing the dedup
    // stack's third signal: perceptual near-duplicate edges (banded
    // stub-pHash pairs at hamming ≤ 3, within modality) run through
    // the SAME Dedup.connectedComponents operator, and every payload
    // gets a transitive cluster id, cluster size, and keep/drop
    // (survivor = min doc_id = the cluster id, by the CC min-label
    // construction). Edge sets stay candidate-sized (banding, never
    // all-pairs); the verdict join's corpus side scans once and the
    // collapsed cluster table broadcasts. The oracle walks the
    // quadratic pair graph with a recursive CTE — pigeonhole-equal
    // to the banded plan.
    Q("mm_dedup_verdict",
      (s, d) => {
        import s.implicits._
        val pairs = MmIndex.phpairs(s, d).select($"doc_a", $"doc_b")
        val edges = pairs.select($"doc_a".as("src"), $"doc_b".as("dst"))
          .unionByName(pairs.select($"doc_b".as("src"), $"doc_a".as("dst")))
        val wCluster = org.apache.spark.sql.expressions.Window
          .partitionBy($"cluster_id")
        Tables.documents(s, d)
          .select($"doc_id",
            element_at(array(lit("image"), lit("audio"), lit("video")),
              ($"doc_id" % 3 + 1).cast("int")).as("kind"))
          .join(Dedup.connectedComponents(edges), Seq("doc_id"), "left")
          .withColumn("cluster_id", coalesce($"cluster_id", $"doc_id"))
          .withColumn("cluster_size", count(lit(1)).over(wCluster))
          .withColumn("is_kept", $"doc_id" === $"cluster_id")
      },
      Some(s"""WITH RECURSIVE $phSql,
        cand AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM ph a JOIN ph b ON a.kind = b.kind AND a.doc_id < b.doc_id
          WHERE bit_count(xor(a.ph, b.ph)) <= 3),
        edges AS (SELECT doc_a AS a, doc_b AS b FROM cand
                  UNION ALL SELECT doc_b AS a, doc_a AS b FROM cand),
        reach(v, r) AS (
          SELECT DISTINCT a AS v, a AS r FROM edges
          UNION
          SELECT e.b AS v, reach.r FROM reach JOIN edges e ON e.a = reach.v),
        clusters AS (
          SELECT v AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY v),
        verdict AS (
          SELECT d.doc_id,
            ['image','audio','video'][CAST(d.doc_id % 3 AS INT) + 1] AS kind,
            COALESCE(cl.cluster_id, d.doc_id) AS cluster_id
          FROM documents d LEFT JOIN clusters cl ON cl.doc_id = d.doc_id)
        SELECT doc_id, kind, cluster_id,
          COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size,
          doc_id = cluster_id AS is_kept
        FROM verdict""")),

    // ------------------------------------------------------------------
    // Tile (patchification) planning through the batched decode path:
    // each image's stub-decoded canvas is covered by a 128×128 tile
    // grid — the ViT-style patch layout a vision pretraining job
    // materializes, with edge tiles clamped to the canvas. Dims come
    // from the REAL decodeFeatures stub; the oracle replays its
    // wrapping-Long checksum (HUGEINT mod-2⁶⁴ + re-sign, the
    // mm_decode_features machinery) to reconstruct identical
    // width/height. Tile math is pure integer ceil-division and
    // clamping; the explode is a narrow generator bounded by
    // ⌈w/128⌉·⌈h/128⌉ per image — no shuffle, payloads never move.
    Q("mm_tile_plan",
      (s, d) => {
        import s.implicits._
        MmIndex.features(s, d)
          .filter($"kind" === "image")
          .select($"doc_id", $"width".cast("long").as("width"),
            $"height".cast("long").as("height"))
          .withColumn("nx", expr("(width + 127) div 128"))
          .withColumn("ny", expr("(height + 127) div 128"))
          .withColumn("tx", explode(sequence(lit(0L), $"nx" - 1)))
          .withColumn("ty", explode(sequence(lit(0L), $"ny" - 1)))
          .select($"doc_id", $"width", $"height", $"tx", $"ty",
            ($"tx" * 128).as("x0"), ($"ty" * 128).as("y0"),
            least($"tx" * 128 + 128, $"width").as("x1"),
            least($"ty" * 128 + 128, $"height").as("y1"))
      },
      Some("""WITH decoded AS (
          SELECT doc_id,
            list_reduce(
              list_prepend(CAST(0 AS HUGEINT),
                list_transform(generate_series(1, length(text)),
                  i -> CAST(ord(substr(text, i, 1)) AS HUGEINT))),
              (h, b) -> (h * 31 + b) % 18446744073709551616) AS hu
          FROM documents WHERE doc_id % 3 = 0),
        signed AS (
          SELECT doc_id, CASE WHEN hu >= 9223372036854775808
                         THEN hu - 18446744073709551616 ELSE hu END AS s
          FROM decoded),
        dims AS (
          SELECT doc_id,
            CAST(16 + abs(s % 1024) AS BIGINT) AS width,
            CAST(16 + abs((CASE WHEN s >= 0 THEN s // 1024
                  ELSE -((-s + 1023) // 1024) END) % 1024) AS BIGINT)
              AS height
          FROM signed),
        grid AS (
          SELECT doc_id, width, height,
            unnest(generate_series(0, (width + 127) // 128 - 1)) AS tx
          FROM dims)
        SELECT doc_id, width, height, tx,
          unnest(generate_series(0, (height + 127) // 128 - 1)) AS ty,
          tx * 128 AS x0,
          unnest(generate_series(0, (height + 127) // 128 - 1)) * 128 AS y0,
          least(tx * 128 + 128, width) AS x1,
          least(unnest(generate_series(0, (height + 127) // 128 - 1)) * 128
            + 128, height) AS y1
        FROM grid"""))
  )

  val all3: Seq[Q] = Seq(
    // ------------------------------------------------------------------
    // Interleaved-sequence packing across modalities: each document's
    // training-sequence cost is its subword token count plus its
    // media cost — 258 tokens per ViT tile for images (the
    // mm_tile_plan grid), one token per 160 payload bytes for audio
    // (a 10 ms-frame stand-in), 258 per sampled frame for video —
    // and documents are greedily packed into 8192-token batches per
    // modality shard (training shards are modality-homogeneous; the
    // window partitions by kind, so the packing distributes and no
    // global window exists). Costs flow through the REAL
    // decodeFeatures stub path; the oracle replays the wrapping-Long
    // checksum to reconstruct identical dims. Same exclusive
    // running-sum device as txt_pack_batches — the shuffle carries
    // one row per document, never payload bytes.
    Q("mm_modality_pack",
      (s, d) => {
        import s.implicits._
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"kind").orderBy($"doc_id")
        val feats = MmIndex.features(s, d)
          .select($"doc_id", $"kind",
            $"byte_len".cast("long").as("byte_len"),
            $"width".cast("long").as("width"),
            $"height".cast("long").as("height"),
            $"n_frames".cast("long").as("n_frames"))
        val toks = Tables.documents(s, d)
          .select($"doc_id",
            TextAnalysis.subwordCount($"text").cast("long").as("n_tok"))
        feats.join(toks, "doc_id")
          .withColumn("media_cost",
            when($"kind" === "image", expr(
              "258 * ((width + 127) div 128) * ((height + 127) div 128)"))
            .when($"kind" === "audio", expr("byte_len div 160"))
            .otherwise(expr("258 * n_frames")))
          .withColumn("seq_cost", $"n_tok" + $"media_cost")
          .withColumn("cum_excl", sum($"seq_cost").over(w) - $"seq_cost")
          .select($"doc_id", $"kind", $"n_tok", $"media_cost", $"seq_cost",
            expr("cum_excl div 8192").as("batch_id"))
      },
      Some("""WITH decoded AS (
          SELECT doc_id,
            list_reduce(
              list_prepend(CAST(0 AS HUGEINT),
                list_transform(generate_series(1, length(text)),
                  i -> CAST(ord(substr(text, i, 1)) AS HUGEINT))),
              (h, b) -> (h * 31 + b) % 18446744073709551616) AS hu
          FROM documents WHERE doc_id % 3 = 0),
        signed AS (
          SELECT doc_id, CASE WHEN hu >= 9223372036854775808
                         THEN hu - 18446744073709551616 ELSE hu END AS s
          FROM decoded),
        dims AS (
          SELECT doc_id,
            CAST(16 + abs(s % 1024) AS BIGINT) AS width,
            CAST(16 + abs((CASE WHEN s >= 0 THEN s // 1024
                  ELSE -((-s + 1023) // 1024) END) % 1024) AS BIGINT)
              AS height
          FROM signed),
        base AS (
          SELECT d.doc_id,
            ['image','audio','video'][CAST(d.doc_id % 3 AS INT) + 1]
              AS kind,
            CAST(octet_length(encode(d.text)) AS BIGINT) AS byte_len,
            CAST(len(list_filter(
              string_split_regex(lower(d.text), '[^a-z0-9]+'),
              x -> len(x) > 0)) AS BIGINT) AS n_tok,
            m.width, m.height
          FROM documents d LEFT JOIN dims m ON m.doc_id = d.doc_id),
        costed AS (
          SELECT doc_id, kind, n_tok,
            CASE kind
              WHEN 'image' THEN
                258 * ((width + 127) // 128) * ((height + 127) // 128)
              WHEN 'audio' THEN byte_len // 160
              ELSE 258 * (1 + byte_len % 32) END AS media_cost
          FROM base)
        SELECT doc_id, kind, n_tok, media_cost,
          n_tok + media_cost AS seq_cost,
          CAST((SUM(n_tok + media_cost) OVER (PARTITION BY kind
              ORDER BY doc_id) - (n_tok + media_cost)) // 8192 AS BIGINT)
            AS batch_id
        FROM costed""")),

    // ------------------------------------------------------------------
    // Audio/video synchronization alignment — the multimodal ETL step
    // that stamps every sampled video frame with the audio analysis
    // window covering it, so downstream feature fusion reads aligned
    // (frame, audio-window) pairs. Frames are mm_frame_sample's
    // stride-4 grid at 24 fps; the same container's audio track
    // derives its sample rate and 25 ms / 10 ms framing exactly like
    // mm_audio_windows. Both timelines are exact integer
    // MILLISECONDS (`idx·1000 div fps`, `idx·hop·1000 div sr`) so
    // the alignment and the exported lag carry no IEEE anywhere.
    // The join is the shared window-carry [[graft.core.Joins.asofJoin]]
    // (backward: latest window start ≤ frame time) — ONE (doc_id)
    // shuffle regardless of how many windows per doc, the same
    // operator the feature-store queries ride, against DuckDB's
    // native ASOF JOIN as the oracle. sync_lag_ms < hop_ms for every
    // frame inside the audio track's span — frames past the last
    // window accumulate lag linearly (the drift a real sync monitor
    // alerts on).
    Q("mm_av_align",
      (s, d) => {
        import s.implicits._
        val media = MmIndex.features(s, d)
          .filter($"kind" === "video")
          .select($"doc_id", $"byte_len".cast("long").as("bl"),
            $"n_frames".cast("long").as("n_frames"))
        val frames = media
          .select($"doc_id",
            explode(sequence(lit(0L), $"n_frames" - 1, lit(4L)))
              .as("frame_idx"))
          .withColumn("t_ms", expr("frame_idx * 1000 div 24"))
        val audio = media
          .select($"doc_id",
            element_at(
              array(lit(8000L), lit(16000L), lit(22050L), lit(44100L)),
              ($"bl" % 4 + 1).cast("int")).as("sr"),
            ($"bl" * 64).as("n_samples"))
          .withColumn("flen", expr("sr * 25 div 1000"))
          .withColumn("hop", expr("sr * 10 div 1000"))
          .withColumn("n_aw",
            when($"n_samples" >= $"flen",
              lit(1L) + expr("(n_samples - flen) div hop"))
              .otherwise(lit(0L)))
          .filter($"n_aw" > 0)
          .select($"doc_id", $"sr", $"hop",
            explode(sequence(lit(0L), $"n_aw" - 1)).as("aw_idx"))
          .select($"doc_id", $"aw_idx",
            expr("aw_idx * hop * 1000 div sr").as("t_ms"))
          .withColumn("aw_start", $"t_ms")
        // Inner-asof semantics by construction: asofJoin carries NULLs
        // for left rows with no window (a track whose n_samples < flen
        // yields n_aw=0), while the DuckDB ASOF JOIN oracle is inner —
        // drop the unmatched frames explicitly so the two sides agree
        // on any corpus, not just one that happens to lack such docs.
        graft.core.Joins.asofJoin(
            frames, audio, "doc_id", "t_ms", Seq("aw_idx", "aw_start"))
          .filter($"asof_aw_idx".isNotNull)
          .select($"doc_id", $"frame_idx", $"t_ms",
            $"asof_aw_idx".as("aw_idx"),
            $"asof_aw_start".as("aw_start_ms"),
            ($"t_ms" - $"asof_aw_start").as("sync_lag_ms"))
      },
      Some("""WITH v AS (
          SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT)
            AS bl
          FROM documents WHERE doc_id % 3 = 2),
        fr AS (
          SELECT doc_id,
            unnest(generate_series(0, (1 + bl % 32) - 1, 4))
              AS frame_idx
          FROM v),
        frt AS (SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
            frame_idx * 1000 // 24 AS t_ms
          FROM fr),
        aud AS (
          SELECT doc_id,
            ([8000, 16000, 22050, 44100])[CAST(bl % 4 + 1 AS INTEGER)]
              AS sr,
            bl * 64 AS n_samples
          FROM v),
        awf AS (
          SELECT doc_id, sr, sr * 10 // 1000 AS hop,
            CASE WHEN n_samples >= sr * 25 // 1000
              THEN 1 + (n_samples - sr * 25 // 1000)
                // (sr * 10 // 1000)
              ELSE 0 END AS n_aw
          FROM aud),
        awt AS (
          SELECT doc_id,
            CAST(unnest(generate_series(0, n_aw - 1)) AS BIGINT)
              AS aw_idx,
            unnest(generate_series(0, n_aw - 1)) * hop * 1000 // sr
              AS aw_start_ms
          FROM awf WHERE n_aw > 0)
        SELECT f.doc_id, f.frame_idx, f.t_ms, a.aw_idx, a.aw_start_ms,
          f.t_ms - a.aw_start_ms AS sync_lag_ms
        FROM frt f ASOF JOIN awt a
          ON f.doc_id = a.doc_id AND f.t_ms >= a.aw_start_ms""")),

    // ------------------------------------------------------------------
    // Contrastive-pair mining — the (anchor, hard-negative) manifest
    // a CLIP-style multimodal trainer consumes: for every image doc,
    // up to 3 hard negatives from the SAME source whose payload size
    // is nearest the anchor's (size as the deterministic hardness
    // proxy this container can compute; a production pipeline swaps
    // in embedding distance — the mining plan is identical). Per
    // source the docs are totally ordered by (byte_len, doc_id); the
    // 4 sort-neighbors (lag/lead 1..2) are the only candidates that
    // can be nearest in a 1-D ordering, so candidate generation is
    // O(1) per row on ONE per-source window — never a same-source
    // self-join (which is quadratic in source size under skew). A
    // stack unpivot then ranks the 4 by (gap, neg_id) and keeps 3.
    // Everything integer, every ordering total — bit-stable at any
    // partition count.
    Q("mm_contrastive_pairs",
      (s, d) => {
        import s.implicits._
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"source").orderBy($"blen", $"doc_id")
        val img = Tables.documents(s, d)
          .filter($"doc_id" % 3 === 0)
          .select($"doc_id", $"source",
            octet_length($"text").cast("long").as("blen"))
        val cands = img
          .withColumn("c1_id", lag($"doc_id", 1).over(w))
          .withColumn("c1_len", lag($"blen", 1).over(w))
          .withColumn("c2_id", lead($"doc_id", 1).over(w))
          .withColumn("c2_len", lead($"blen", 1).over(w))
          .withColumn("c3_id", lag($"doc_id", 2).over(w))
          .withColumn("c3_len", lag($"blen", 2).over(w))
          .withColumn("c4_id", lead($"doc_id", 2).over(w))
          .withColumn("c4_len", lead($"blen", 2).over(w))
          .select($"doc_id".as("anchor_id"), $"source", $"blen",
            expr("""stack(4, c1_id, c1_len, c2_id, c2_len,
              c3_id, c3_len, c4_id, c4_len) AS (neg_id, neg_len)"""))
          .filter($"neg_id".isNotNull)
          .withColumn("len_gap", abs($"blen" - $"neg_len"))
        val wr = org.apache.spark.sql.expressions.Window
          .partitionBy($"anchor_id").orderBy($"len_gap", $"neg_id")
        cands.withColumn("rank", row_number().over(wr).cast("long"))
          .filter($"rank" <= 3)
          .select($"anchor_id", $"source", $"neg_id", $"len_gap",
            $"rank")
      },
      Some("""WITH img AS (
          SELECT doc_id, source,
            CAST(octet_length(encode(text)) AS BIGINT) AS blen
          FROM documents WHERE doc_id % 3 = 0),
        nbr AS (
          SELECT doc_id, source, blen,
            lag(doc_id, 1) OVER w AS c1_id,
            lag(blen, 1) OVER w AS c1_len,
            lead(doc_id, 1) OVER w AS c2_id,
            lead(blen, 1) OVER w AS c2_len,
            lag(doc_id, 2) OVER w AS c3_id,
            lag(blen, 2) OVER w AS c3_len,
            lead(doc_id, 2) OVER w AS c4_id,
            lead(blen, 2) OVER w AS c4_len
          FROM img
          WINDOW w AS (PARTITION BY source ORDER BY blen, doc_id)),
        cands AS (
          SELECT doc_id AS anchor_id, source, blen, c1_id AS neg_id,
            c1_len AS neg_len FROM nbr
          UNION ALL SELECT doc_id, source, blen, c2_id, c2_len FROM nbr
          UNION ALL SELECT doc_id, source, blen, c3_id, c3_len FROM nbr
          UNION ALL SELECT doc_id, source, blen, c4_id, c4_len
            FROM nbr),
        gapped AS (
          SELECT anchor_id, source, neg_id,
            abs(blen - neg_len) AS len_gap
          FROM cands WHERE neg_id IS NOT NULL)
        SELECT anchor_id, source, neg_id, len_gap,
          CAST(rank AS BIGINT) AS rank
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY anchor_id
                ORDER BY len_gap, neg_id) AS rank
              FROM gapped) x
        WHERE rank <= 3"""))
  )
}
