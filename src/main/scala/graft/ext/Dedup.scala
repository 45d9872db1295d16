package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Deduplication operators for a training-data pipeline: exact
  * (content-hash groupBy), MinHash signatures + LSH banding
  * (shingle → minhash → band → bucket-join), inverted-index n-gram
  * Jaccard verification, and SimHash bit-vote fingerprints.
  *
  * Scale design: every operator is a hash-shuffle on a derived,
  * high-cardinality key (content hash / band hash / n-gram) — never a
  * pairwise cross-join. Candidate pairs are generated only inside LSH
  * buckets or shared-gram groups, so work scales with collision count
  * rather than corpus², which is the property that survives 100 TB
  * (SURVEY.md §7.4-7). The portable hash is md5 (bit-identical in any
  * engine, including the DuckDB oracle); swap in xxhash64 for pure-
  * Spark deployments where portability is not required.
  *
  * The corpus is `documents` augmented with deterministic exact
  * duplicates (doc_id+100000, every 10th doc) and near-duplicates
  * (doc_id+200000, every 7th doc, one appended token), constructed
  * identically in the oracle — without them the synthetic corpus has
  * no duplicates at all and every operator would be vacuous.
  */
object Dedup {

  def corpus(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, d).select($"doc_id", $"text")
    docs
      .unionByName(docs.filter($"doc_id" % 10 === 0)
        .select(($"doc_id" + 100000L).as("doc_id"), $"text"))
      .unionByName(docs.filter($"doc_id" % 7 === 0)
        .select(($"doc_id" + 200000L).as("doc_id"),
          concat($"text", lit(" xtra")).as("text")))
  }

  private val corpusSql =
    """corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL SELECT doc_id + 100000, text FROM documents WHERE doc_id % 10 = 0
      UNION ALL SELECT doc_id + 200000, text || ' xtra' FROM documents WHERE doc_id % 7 = 0)"""

  /** Normalized text for shingling. */
  private def norm(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  private val normSql =
    "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

  /** 5-char shingles per doc (explode positions + substr). NOT
    * deduplicated: the MinHash consumer is min-aggregated, and min is
    * duplicate-insensitive — a distinct() here would shuffle every
    * raw shingle string, while without it the only wide operation is
    * the groupBy(doc_id) whose map-side combine ships one partial row
    * per doc per partition. Callers needing set semantics (Jaccard)
    * deduplicate their own keys. */
  def charShingles(df: DataFrame, k: Int = 5): DataFrame = {
    val n = df.sparkSession
    import n.implicits._
    df.withColumn("norm", norm($"text"))
      .select($"doc_id",
        explode(sequence(lit(1), greatest(length($"norm") - (k - 1), lit(1))))
          .as("i"), $"norm")
      .select($"doc_id", $"norm".substr($"i", lit(k)).as("shingle"))
  }

  private def shinglesSql(k: Int = 5) =
    s"""shingles AS (
      SELECT DISTINCT doc_id, substr(norm, i, $k) AS shingle
      FROM (SELECT doc_id, norm,
              unnest(generate_series(1, greatest(length(norm) - ${k - 1}, 1))) AS i
            FROM (SELECT doc_id, $normSql AS norm FROM corpus) y) x)"""

  /** 4-seed MinHash signature per doc. */
  def minhashSignatures(shingles: DataFrame): DataFrame =
    shingles.groupBy(col("doc_id")).agg(
      min(md5(concat(lit("s1"), col("shingle")))).as("h1"),
      min(md5(concat(lit("s2"), col("shingle")))).as("h2"),
      min(md5(concat(lit("s3"), col("shingle")))).as("h3"),
      min(md5(concat(lit("s4"), col("shingle")))).as("h4"))

  private val signaturesSql =
    """signatures AS (
      SELECT doc_id,
        MIN(md5('s1' || shingle)) AS h1, MIN(md5('s2' || shingle)) AS h2,
        MIN(md5('s3' || shingle)) AS h3, MIN(md5('s4' || shingle)) AS h4
      FROM shingles GROUP BY doc_id)"""

  /** LSH banding: 2 bands × 2 hashes; pairs sharing any band. */
  def lshCandidates(signatures: DataFrame): DataFrame = {
    val s = signatures.sparkSession
    import s.implicits._
    val banded = signatures.select($"doc_id",
      posexplode(array(md5(concat($"h1", $"h2")), md5(concat($"h3", $"h4")))))
      .toDF("doc_id", "band_idx", "band_hash")
    val a = banded.as("a")
    val b = banded.as("b")
    a.join(b, $"a.band_idx" === $"b.band_idx" &&
        $"a.band_hash" === $"b.band_hash" &&
        $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
      .distinct()
  }

  private val bandsSql =
    """bands AS (
      SELECT doc_id, 0 AS band_idx, md5(h1 || h2) AS band_hash FROM signatures
      UNION ALL
      SELECT doc_id, 1 AS band_idx, md5(h3 || h4) AS band_hash FROM signatures),
    candidates AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
       AND a.doc_id < b.doc_id)"""

  val all: Seq[Q] = Seq(
    // ------------------------------------------------------------------
    // Exact dedup: content-hash groupBy, canonical = min id.
    Q("dedup_exact",
      (s, d) => {
        import s.implicits._
        corpus(s, d)
          .groupBy(md5($"text").as("content_hash"))
          .agg(min($"doc_id").as("canonical_id"), count(lit(1)).as("n_copies"))
          .filter($"n_copies" > 1)
      },
      Some(s"""WITH $corpusSql
        SELECT md5(text) AS content_hash, MIN(doc_id) AS canonical_id,
          COUNT(*) AS n_copies
        FROM corpus GROUP BY md5(text) HAVING COUNT(*) > 1""")),

    // ------------------------------------------------------------------
    // MinHash signatures (shingle → 4-seed min-hash).
    Q("dedup_minhash_sig",
      (s, d) => minhashSignatures(charShingles(corpus(s, d))),
      Some(s"""WITH $corpusSql, ${shinglesSql()}, $signaturesSql
        SELECT doc_id, h1, h2, h3, h4 FROM signatures""")),

    // ------------------------------------------------------------------
    // LSH candidate pairs (band → bucket-join).
    Q("dedup_lsh_pairs",
      (s, d) => lshCandidates(minhashSignatures(charShingles(corpus(s, d)))),
      Some(s"""WITH $corpusSql, ${shinglesSql()}, $signaturesSql, $bandsSql
        SELECT doc_a, doc_b FROM candidates""")),

    // ------------------------------------------------------------------
    // N-gram Jaccard near-dup: inverted-index join on word 3-grams —
    // pairs materialize only where grams collide; never corpus².
    Q("dedup_ngram_jaccard",
      (s, d) => {
        import s.implicits._
        val toks = split(norm($"text"), " ")
        val grams = corpus(s, d)
          .select($"doc_id", $"text")
          .withColumn("toks", toks)
          .select($"doc_id",
            explode(sequence(lit(1), greatest(size($"toks") - 2, lit(1))))
              .as("i"), $"toks")
          .select($"doc_id", concat_ws(" ",
            element_at($"toks", $"i"), element_at($"toks", $"i" + 1),
            element_at($"toks", $"i" + 2)).as("gram"))
          .distinct()
        val sizes = grams.groupBy($"doc_id").agg(count(lit(1)).as("n_grams"))
        val inter = grams.as("a")
          .join(grams.as("b"),
            $"a.gram" === $"b.gram" && $"a.doc_id" < $"b.doc_id")
          .groupBy($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
          .agg(count(lit(1)).as("n_inter"))
        inter
          .join(sizes.withColumnRenamed("doc_id", "doc_a")
            .withColumnRenamed("n_grams", "na"), "doc_a")
          .join(sizes.withColumnRenamed("doc_id", "doc_b")
            .withColumnRenamed("n_grams", "nb"), "doc_b")
          .withColumn("jaccard", $"n_inter".cast("double") /
            ($"na" + $"nb" - $"n_inter").cast("double"))
          .filter($"jaccard" >= 0.5)
          .select($"doc_a", $"doc_b", $"jaccard")
      },
      Some(s"""WITH $corpusSql,
        grams AS (
          SELECT DISTINCT doc_id,
            toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS gram
          FROM (SELECT doc_id, toks,
                  unnest(generate_series(1, greatest(len(toks) - 2, 1))) AS i
                FROM (SELECT doc_id, string_split($normSql, ' ') AS toks
                      FROM corpus) y) x),
        sizes AS (SELECT doc_id, COUNT(*) AS n_grams FROM grams GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
          FROM grams a JOIN grams b ON a.gram = b.gram AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id)
        SELECT doc_a, doc_b,
          CAST(n_inter AS DOUBLE) / CAST(sa.n_grams + sb.n_grams - n_inter AS DOUBLE)
            AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE CAST(n_inter AS DOUBLE) / CAST(sa.n_grams + sb.n_grams - n_inter AS DOUBLE)
              >= 0.5""")),

    // ------------------------------------------------------------------
    // SimHash: 16-bit fingerprint from per-token md5 bit votes.
    Q("dedup_simhash",
      (s, d) => {
        import s.implicits._
        // One aggregation, 16 vote columns — no bit explode: the
        // (doc, token) rows carry a 16-bit token hash value and each
        // bit contributes ±1 to its position's vote. Map-side partial
        // aggregation collapses to one row per doc before the shuffle.
        val toks = corpus(s, d)
          .select($"doc_id", explode(split(norm($"text"), " ")).as("tok"))
          .distinct()
          .selectExpr("doc_id",
            "cast(conv(substr(md5(tok), 1, 4), 16, 10) as int) AS v16")
        val votes = (0 until 16).map(p =>
          sum(expr(s"2 * ((shiftright(v16, ${15 - p})) & 1) - 1"))
            .as(s"vote$p"))
        val simhash = (0 until 16).map(p =>
          expr(s"CASE WHEN vote$p > 0 THEN shiftleft(1, $p) ELSE 0 END"))
          .reduce(_ + _)
        toks.groupBy($"doc_id")
          .agg(votes.head, votes.tail: _*)
          .select($"doc_id", simhash.cast("long").as("simhash"))
      },
      Some(s"""WITH $corpusSql,
        toks AS (
          SELECT DISTINCT doc_id, tok FROM (
            SELECT doc_id, unnest(string_split($normSql, ' ')) AS tok
            FROM corpus) x),
        bits AS (
          SELECT doc_id, p,
            (2 * (((instr('0123456789abcdef',
                          substr(substr(md5(tok), 1, 4), (p // 4) + 1, 1)) - 1)
                   >> (3 - (p % 4))) & 1)) - 1 AS vote
          FROM toks, generate_series(0, 15) t(p)),
        votes AS (
          SELECT doc_id, p, SUM(vote) AS votes FROM bits GROUP BY doc_id, p)
        SELECT doc_id,
          CAST(SUM(CASE WHEN votes > 0 THEN (1 << p) ELSE 0 END) AS BIGINT)
            AS simhash
        FROM votes GROUP BY doc_id"""))
  )
}
