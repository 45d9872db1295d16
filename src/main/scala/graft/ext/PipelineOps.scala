package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Round-5 training-data-pipeline wave: the cross-family operators a
  * 100 TB curation pipeline runs between the dedup/similarity/quality
  * stages that already exist —
  *
  *   - `ev_srm_check`: sample-ratio-mismatch guard over experiment
  *     assignments (the first health check of any A/B readout);
  *   - `sim_rrf_fusion`: reciprocal-rank fusion of a dense (cosine)
  *     and a lexical (bigram-overlap) retriever — hybrid retrieval;
  *   - `sim_fusion_shift`: its eval — how far fusion moves the dense
  *     ranking (overlap@10 + reciprocal rank of the dense top-1);
  *   - `txt_dsir_weights`: DSIR-style importance weights from hashed
  *     bigram features (Xie et al. 2023, "Data Selection for Language
  *     Models via Importance Resampling") — target-domain upsampling
  *     scores;
  *   - `dedup_semdedup`: SemDeDup (Abbas et al. 2023) — semantic
  *     dedup scoped to coarse-quantizer cells, never all-pairs;
  *   - `dedup_semdedup_recall`: its eval — pair recall of the
  *     cell-scoped pass against label-blocked all-pairs truth;
  *   - `sim_ivf_imbalance`: cell-population skew profile of the IVF
  *     index — the health metric that predicts probe-latency variance.
  *
  * Determinism contract (same as every other family): all exported
  * numerics are integers produced by associative integer sums and a
  * single final `div`; IEEE doubles are only *compared/ranked*, with
  * a total-order tiebreak, never exported.
  */
object PipelineOps {

  import Similarity.{cosine, dotSql}

  /** The 16 deterministic coarse centroids shared with sim_ann_ivf /
    * sim_ivf_assign (the corpus's 16 lowest-id vectors). */
  private def centroids(emb: DataFrame): DataFrame =
    emb.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cid"), col("embedding").as("cemb"))

  /** Nearest-centroid assignment keeping the centroid cosine:
    * broadcast(16 centroids) x corpus scan + per-row top-1 — a
    * narrow map, no corpus shuffle (the 10^9-vector shape). */
  private def assign(emb: DataFrame, cents: DataFrame): DataFrame = {
    val wA = Window.partitionBy(col("vec_id"))
      .orderBy(col("ccos").desc, col("cid"))
    emb.crossJoin(broadcast(cents))
      .withColumn("ccos", cosine(col("embedding"), col("cemb")))
      .withColumn("rk", row_number().over(wA))
      .filter(col("rk") === 1)
      .drop("rk", "cemb")
  }

  /** Oracle CTE: nearest-centroid assignment of a corpus CTE named
    * `aug` (vec_id, embedding [, label]). */
  private val assignSql: String =
    s"""c AS (SELECT vec_id AS cid, embedding AS cemb FROM embeddings
          WHERE vec_id < 16),
        assign AS (
          SELECT vec_id, cid, ccos, embedding FROM (
            SELECT a.vec_id, c.cid, a.embedding,
              ${dotSql("a.embedding", "c.cemb")} /
                (sqrt(${dotSql("a.embedding", "a.embedding")}) *
                 sqrt(${dotSql("c.cemb", "c.cemb")})) AS ccos,
              ROW_NUMBER() OVER (PARTITION BY a.vec_id ORDER BY
                ${dotSql("a.embedding", "c.cemb")} /
                (sqrt(${dotSql("a.embedding", "a.embedding")}) *
                 sqrt(${dotSql("c.cemb", "c.cemb")})) DESC, c.cid) AS rk
            FROM aug a, c) t WHERE rk = 1)"""

  // -------------------------------------------------------------------
  // Shared SemDeDup parts: neardup-planted augmentation (every 20th
  // vector duplicated at +100000 — the sim_embedding_neardup device),
  // cell assignment, and the within-cell >0.95 pair set.

  private def augmented(emb: DataFrame): DataFrame =
    emb.unionByName(
      emb.filter(col("vec_id") % 20 === 0)
        .withColumn("vec_id", col("vec_id") + 100000L))

  /** Within-cell near-dup pairs with both members' centroid cosine —
    * (va, vb, ca, cb), va < vb, cosine > 0.95, same cell only. */
  private def cellPairs(m: DataFrame): DataFrame = {
    val a = m.select(col("vec_id").as("va"), col("cid"),
      col("ccos").as("ca"), col("embedding").as("ea"))
    val b = m.select(col("vec_id").as("vb"), col("cid"),
      col("ccos").as("cb"), col("embedding").as("eb"))
    a.join(b, Seq("cid"))
      .filter(col("va") < col("vb"))
      .filter(cosine(col("ea"), col("eb")) > 0.95)
      .select(col("va"), col("vb"), col("ca"), col("cb"))
  }

  private val augSql: String =
    """aug AS (
          SELECT vec_id, label, embedding FROM embeddings
          UNION ALL
          SELECT vec_id + 100000, label, embedding FROM embeddings
          WHERE vec_id % 20 = 0)"""

  private val cellPairsSql: String =
    s"""dup_pairs AS (
          SELECT a.vec_id AS va, b.vec_id AS vb, a.ccos AS ca, b.ccos AS cb
          FROM assign a JOIN assign b
            ON a.cid = b.cid AND a.vec_id < b.vec_id
          WHERE ${dotSql("a.embedding", "b.embedding")} /
                (sqrt(${dotSql("a.embedding", "a.embedding")}) *
                 sqrt(${dotSql("b.embedding", "b.embedding")})) > 0.95)"""

  // -------------------------------------------------------------------
  // Shared hybrid-retrieval parts: the query slice (vec_id % 97 = 0 —
  // the eval set every sim_* eval uses), dense cosine ranking, and
  // lexical bigram-overlap ranking over the same candidate universe.

  /** Dense arm: broadcast(queries) x corpus, full ranking kept so
    * both the fusion (top-20) and its eval (top-10 truth) slice it. */
  private def denseRanks(emb: DataFrame): DataFrame = {
    val q = emb.filter(col("vec_id") % 97 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qemb"))
    val wD = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("vec_id"))
    emb.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cos", cosine(col("qemb"), col("embedding")))
      .withColumn("rnk_d", row_number().over(wD))
      .filter(col("rnk_d") <= 20)
      .select(col("qid"), col("vec_id").as("cand"), col("rnk_d"))
  }

  /** Lexical arm: distinct bigram overlap between query docs and the
    * embedding-id candidate universe. Bigram keys keep the join
    * selective (unigrams over this corpus's ~60-word vocabulary
    * would explode quadratically at scale). */
  private def lexRanks(s: SparkSession, d: String,
                       emb: DataFrame): DataFrame = {
    val corpusBg = TextIndex.bigrams(s, d)
      .filter(col("w2").isNotNull)
      .join(emb.select(col("vec_id")), col("doc_id") === col("vec_id"),
        "left_semi")
      .select(col("doc_id"),
        concat(col("w1"), lit("|"), col("w2")).as("bg"))
      .distinct()
    val qbg = corpusBg.filter(col("doc_id") % 97 === 0)
      .select(col("doc_id").as("qid"), col("bg"))
    val wL = Window.partitionBy(col("qid"))
      .orderBy(col("shared").desc, col("cand"))
    corpusBg.join(broadcast(qbg), Seq("bg"))
      .filter(col("doc_id") =!= col("qid"))
      .groupBy(col("qid"), col("doc_id").as("cand"))
      .agg(count(lit(1)).as("shared"))
      .withColumn("rnk_l", row_number().over(wL))
      .filter(col("rnk_l") <= 20)
      .select(col("qid"), col("cand"), col("rnk_l"))
  }

  /** RRF-fused ranking (k = 60, credit in integer nano-units) over
    * the union of both arms' top-20 candidate sets. */
  private def fusedRanks(dense: DataFrame, lex: DataFrame): DataFrame = {
    val wF = Window.partitionBy(col("qid"))
      .orderBy(col("rrf_nano").desc, col("cand"))
    dense.join(lex, Seq("qid", "cand"), "full_outer")
      .withColumn("rrf_nano", expr(
        "coalesce(1000000000 div (60 + rnk_d), 0)" +
          " + coalesce(1000000000 div (60 + rnk_l), 0)"))
      .withColumn("rank", row_number().over(wF))
  }

  /** Oracle CTEs `dense20`, `cbg`, `lex20`, `fused` (rrf_nano per
    * candidate, unranked — each consumer ranks its own slice). */
  private val fusionSql: String =
    s"""q AS (
          SELECT vec_id AS qid, embedding AS qemb FROM embeddings
          WHERE vec_id % 97 = 0),
        dense20 AS (
          SELECT qid, cand, rnk_d FROM (
            SELECT qid, e.vec_id AS cand,
              ROW_NUMBER() OVER (PARTITION BY qid ORDER BY
                ${dotSql("qemb", "e.embedding")} /
                (sqrt(${dotSql("qemb", "qemb")}) *
                 sqrt(${dotSql("e.embedding", "e.embedding")})) DESC,
                e.vec_id) AS rnk_d
            FROM q JOIN embeddings e ON e.vec_id <> q.qid) t
          WHERE rnk_d <= 20),
        toks AS (
          SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t
          FROM documents
          WHERE doc_id IN (SELECT vec_id FROM embeddings)),
        cbg AS (
          SELECT doc_id, t[i] || '|' || t[i + 1] AS bg
          FROM toks,
            LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i)
          GROUP BY doc_id, bg),
        lex20 AS (
          SELECT qid, cand, rnk_l FROM (
            SELECT qb.doc_id AS qid, db.doc_id AS cand,
              ROW_NUMBER() OVER (PARTITION BY qb.doc_id
                ORDER BY COUNT(*) DESC, db.doc_id) AS rnk_l
            FROM cbg qb JOIN cbg db
              ON qb.bg = db.bg AND qb.doc_id <> db.doc_id
            WHERE qb.doc_id % 97 = 0
            GROUP BY 1, 2) t WHERE rnk_l <= 20),
        fused AS (
          SELECT COALESCE(d.qid, l.qid) AS qid,
            COALESCE(d.cand, l.cand) AS cand,
            COALESCE(1000000000 // (60 + d.rnk_d), 0)
              + COALESCE(1000000000 // (60 + l.rnk_l), 0) AS rrf_nano
          FROM dense20 d FULL OUTER JOIN lex20 l
            ON d.qid = l.qid AND d.cand = l.cand),
        fused_ranked AS (
          SELECT qid, cand, rrf_nano,
            ROW_NUMBER() OVER (PARTITION BY qid
              ORDER BY rrf_nano DESC, cand) AS rank
          FROM fused)"""

  val all: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // Sample-ratio-mismatch check: BEFORE reading any experiment
    // metric (ev_ab_ttest), verify the assignment itself — a 50/50
    // split whose realized counts chi-square-reject the design ratio
    // means the bucketing (not the treatment) is broken, and every
    // downstream readout is invalid. Two arms side by side: the
    // healthy salted-md5 assignment every split here uses, and a
    // deliberately confounded mod-3 assignment that MUST flag (the
    // spec pins hash-arm clean / mod3-arm flagged). Exposure is one
    // distinct-users shuffle; the 2-cell chi-square is exact integer
    // ppm with the squared deviation in DECIMAL(38,0) (the
    // rel_chi2_independence 128-bit device — at 10^9 users an int64
    // square already overflows). 3.841459 = chi2(0.95, dof 1).
    Q("ev_srm_check",
      (s, d) => {
        import s.implicits._
        val exposed = Tables.events(s, d)
          .select($"event_type", $"user_id").distinct()
        val armed = exposed
          .withColumn("arm", explode(array(lit("hash"), lit("mod3"))))
          .withColumn("is_a",
            when($"arm" === "hash",
              when(substring(md5(concat(lit("srm|"),
                  $"user_id".cast("string"))), 1, 1)
                .isin("0", "1", "2", "3", "4", "5", "6", "7"), 1L)
                .otherwise(0L))
            .otherwise(when($"user_id" % 3 === 0, 1L).otherwise(0L)))
        armed.groupBy($"event_type", $"arm")
          .agg(sum($"is_a").as("n_a"), sum(lit(1L) - $"is_a").as("n_b"))
          .withColumn("chi2_ppm", expr(
            "(cast(n_a - n_b as decimal(38,0)) * (n_a - n_b) * 1000000)" +
              " div (n_a + n_b)"))
          .select($"event_type", $"arm", $"n_a", $"n_b", $"chi2_ppm",
            when($"chi2_ppm" > 3841459L, 1L).otherwise(0L).as("srm_flag"))
      },
      Some("""WITH exposed AS (
          SELECT DISTINCT event_type, user_id FROM events),
        assigned AS (
          SELECT event_type, user_id, arm,
            CASE WHEN arm = 'hash' THEN
              CASE WHEN substr(md5('srm|' || CAST(user_id AS VARCHAR)), 1, 1)
                   IN ('0','1','2','3','4','5','6','7') THEN 1 ELSE 0 END
            ELSE CASE WHEN user_id % 3 = 0 THEN 1 ELSE 0 END END AS is_a
          FROM exposed
          CROSS JOIN (SELECT unnest(['hash', 'mod3']) AS arm)),
        agg AS (
          SELECT event_type, arm,
            CAST(SUM(is_a) AS BIGINT) AS n_a,
            CAST(SUM(1 - is_a) AS BIGINT) AS n_b
          FROM assigned GROUP BY event_type, arm)
        SELECT event_type, arm, n_a, n_b,
          CAST(CAST(n_a - n_b AS HUGEINT) * (n_a - n_b) * 1000000
            // (n_a + n_b) AS BIGINT) AS chi2_ppm,
          CAST(CASE WHEN CAST(n_a - n_b AS HUGEINT) * (n_a - n_b) * 1000000
            // (n_a + n_b) > 3841459 THEN 1 ELSE 0 END AS BIGINT)
            AS srm_flag
        FROM agg""")),

    // ------------------------------------------------------------------
    // CUPED variance reduction (Deng et al. 2013): before an A/B
    // readout, measure how much pre-period behavior explains the
    // post-period metric — theta = cov(X,Y)/var(X) and the variance
    // reduction rho^2, per event_type. X/Y are per-user pre/post
    // value sums quantized to integer micro-units, the moment sums
    // ride DECIMAL(38,0) (x*y per user overflows int64 once a user's
    // period sum passes ~3*10^9 micro), and the exported theta/rho^2
    // are DEFINED as two-step integer divisions — bit-identical in
    // both engines, no IEEE covariance anywhere. The pre/post split
    // is day-15 from the corpus's own first day (one broadcast
    // scalar); per-user collapse is ONE (event_type, user) shuffle.
    // rho2_ppm answers "is CUPED worth wiring up for this metric";
    // theta_micro is the adjustment coefficient itself.
    Q("ev_cuped",
      (s, d) => {
        import s.implicits._
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        val ev = Tables.events(s, d)
        val t0 = ev.agg(unix_micros(date_trunc("day", min($"ts")))
          .as("t0_us"))
        val split = expr("t0_us + 1296000000000")  // 15 days of micros
        val vMicro = floor($"value" * 1000000).cast("long")
        val ux = ev.crossJoin(broadcast(t0))
          .select($"event_type", $"user_id",
            when(unix_micros($"ts") < split, vMicro).otherwise(0L).as("vx"),
            when(unix_micros($"ts") >= split, vMicro).otherwise(0L).as("vy"))
          .groupBy($"event_type", $"user_id")
          .agg(sum($"vx").as("x"), sum($"vy").as("y"))
        val agg = ux.groupBy($"event_type")
          .agg(count(lit(1)).as("n"),
            sum($"x".cast(dec)).as("sx"), sum($"y".cast(dec)).as("sy"),
            sum(($"x".cast(dec) * $"y")).as("sxy"),
            sum(($"x".cast(dec) * $"x")).as("sxx"),
            sum(($"y".cast(dec) * $"y")).as("syy"))
        agg
          .withColumn("covn", expr("n * sxy - sx * sy"))
          .withColumn("varn", expr("n * sxx - sx * sx"))
          .withColumn("varyn", expr("n * syy - sy * sy"))
          .withColumn("theta_micro",
            expr("(covn * 1000000) div nullif(varn, 0)"))
          .select($"event_type", $"n", $"theta_micro",
            expr("(theta_micro * covn) div nullif(varyn, 0)").as("rho2_ppm"))
      },
      Some("""WITH d0 AS (
          SELECT epoch_us(CAST(date_trunc('day', MIN(ts)) AS TIMESTAMP))
            AS t0_us FROM events),
        ux AS (
          SELECT event_type, user_id,
            CAST(SUM(CASE WHEN epoch_us(ts) < t0_us + 1296000000000
              THEN CAST(floor(value * 1000000) AS BIGINT) ELSE 0 END)
              AS BIGINT) AS x,
            CAST(SUM(CASE WHEN epoch_us(ts) >= t0_us + 1296000000000
              THEN CAST(floor(value * 1000000) AS BIGINT) ELSE 0 END)
              AS BIGINT) AS y
          FROM events CROSS JOIN d0
          GROUP BY event_type, user_id),
        agg AS (
          SELECT event_type, COUNT(*) AS n,
            CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy,
            CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
            CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
            CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
          FROM ux GROUP BY event_type),
        norm AS (
          SELECT event_type, n,
            n * sxy - sx * sy AS covn,
            n * sxx - sx * sx AS varn,
            n * syy - sy * sy AS varyn
          FROM agg)
        SELECT event_type, n,
          CAST(covn * 1000000 // NULLIF(varn, 0) AS BIGINT) AS theta_micro,
          CAST(((covn * 1000000 // NULLIF(varn, 0)) * covn)
            // NULLIF(varyn, 0) AS BIGINT) AS rho2_ppm
        FROM norm""")),

    // ------------------------------------------------------------------
    // Hybrid retrieval: reciprocal-rank fusion (Cormack et al. 2009)
    // of a dense cosine top-20 and a lexical bigram-overlap top-20,
    // k = 60. RRF credit is exported in integer nano-units
    // (10^9 div (60 + rank)) — integer division both engines share —
    // so the fused score is exact; candidate id breaks rrf ties.
    // Scale: the query set is a broadcast-sized eval slice by
    // construction; the dense arm is broadcast(queries) x corpus
    // (linear scan — the brute-force arm sim_ann_* exists to
    // replace); the lexical arm joins on bigram keys whose document
    // frequency bounds the pair fan-out.
    Q("sim_rrf_fusion",
      (s, d) => {
        import s.implicits._
        val emb = Tables.embeddings(s, d).select($"vec_id", $"embedding")
        fusedRanks(denseRanks(emb), lexRanks(s, d, emb))
          .filter($"rank" <= 10)
          .select($"qid", $"rank", $"cand", $"rrf_nano")
      },
      Some(s"""WITH $fusionSql
        SELECT qid, rank, cand, rrf_nano
        FROM fused_ranked WHERE rank <= 10""")),

    // ------------------------------------------------------------------
    // Fusion-shift eval: what did the lexical arm DO to the dense
    // ranking? Per query: overlap@10 between the fused and dense
    // top-10s, and the reciprocal rank (integer micro-units, 0 =
    // evicted) of the dense #1 inside the fused list. overlap@10 = 10
    // with rr = 1000000 everywhere would mean fusion is a no-op;
    // mass evictions of the dense #1 would mean the lexical arm
    // overpowers the dense signal — the dial this eval exists to
    // read before a fusion ships.
    Q("sim_fusion_shift",
      (s, d) => {
        import s.implicits._
        val emb = Tables.embeddings(s, d).select($"vec_id", $"embedding")
        // Lineage-cut + persist the shared sub-frames: dense is
        // referenced THREE times (fusion arm, overlap arm, rank-1
        // arm) and fused10 twice, and Catalyst does not dedupe
        // repeated subtrees — unpinned, the broadcast×corpus cosine
        // pass re-ran once per reference. Both frames are
        // top-20×queries-sized; lazy pins (no count barrier), the
        // caller's single action computes each once, Bench/Verify
        // drop the pins per query.
        def pin(df: DataFrame): DataFrame = {
          val c = s.createDataFrame(df.rdd, df.schema)
          c.persist(); c
        }
        val dense = pin(denseRanks(emb))
        val fused10 = pin(fusedRanks(dense, lexRanks(s, d, emb))
          .filter($"rank" <= 10)
          .select($"qid", $"cand", $"rank"))
        val overlap = dense.filter($"rnk_d" <= 10)
          .join(fused10, Seq("qid", "cand"))
          .groupBy($"qid").agg(count(lit(1)).as("n_overlap"))
        dense.filter($"rnk_d" === 1)
          .select($"qid", $"cand")
          .join(fused10, Seq("qid", "cand"), "left_outer")
          .select($"qid",
            coalesce(expr("1000000 div rank"), lit(0L)).as("rr_micro"))
          .join(overlap, Seq("qid"), "left_outer")
          .select($"qid", coalesce($"n_overlap", lit(0L)).as("n_overlap"),
            $"rr_micro")
      },
      Some(s"""WITH $fusionSql,
        fused10 AS (
          SELECT qid, cand, rank FROM fused_ranked WHERE rank <= 10),
        overlap AS (
          SELECT d.qid, COUNT(*) AS n_overlap
          FROM dense20 d JOIN fused10 f
            ON d.qid = f.qid AND d.cand = f.cand
          WHERE d.rnk_d <= 10
          GROUP BY d.qid)
        SELECT d.qid,
          CAST(COALESCE(o.n_overlap, 0) AS BIGINT) AS n_overlap,
          CAST(COALESCE(1000000 // f.rank, 0) AS BIGINT) AS rr_micro
        FROM dense20 d
        LEFT JOIN fused10 f ON f.qid = d.qid AND f.cand = d.cand
        LEFT JOIN overlap o ON o.qid = d.qid
        WHERE d.rnk_d = 1""")),

    // ------------------------------------------------------------------
    // Difference-in-differences estimator: the observational
    // complement of ev_ab_ttest/ev_cuped — effect = (treated post −
    // treated pre) − (control post − control pre), per event_type.
    // Treatment is the salted-md5 user split, the pre/post boundary
    // the same day-15 scalar as ev_cuped. The four cell means are
    // exported in exact integer micro-units (DECIMAL(38,0) sums, one
    // final div each — at 10^12 events an int64 value sum overflows),
    // so the DiD contrast is a pure integer expression both engines
    // share. One (event_type, treated, post) aggregation over a
    // narrow map — cells ride map-side partials, no user shuffle at
    // all.
    Q("ev_diff_in_diff",
      (s, d) => {
        import s.implicits._
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        val ev = Tables.events(s, d)
        val t0 = ev.agg(unix_micros(date_trunc("day", min($"ts")))
          .as("t0_us"))
        val cells = ev.crossJoin(broadcast(t0))
          .select($"event_type",
            when(substring(md5(concat(lit("did|"),
                $"user_id".cast("string"))), 1, 1)
              .isin("0", "1", "2", "3", "4", "5", "6", "7"), 1L)
              .otherwise(0L).as("treated"),
            when(unix_micros($"ts") >= expr("t0_us + 1296000000000"), 1L)
              .otherwise(0L).as("post"),
            floor($"value" * 1000000).cast("long").as("v"))
          .groupBy($"event_type", $"treated", $"post")
          .agg(count(lit(1)).as("n"), sum($"v".cast(dec)).as("sv"))
          .select($"event_type", $"treated", $"post",
            expr("sv div n").as("mean_micro"))
        cells.groupBy($"event_type")
          .agg(
            min(when($"treated" === 1 && $"post" === 0, $"mean_micro"))
              .as("mean_t_pre"),
            min(when($"treated" === 1 && $"post" === 1, $"mean_micro"))
              .as("mean_t_post"),
            min(when($"treated" === 0 && $"post" === 0, $"mean_micro"))
              .as("mean_c_pre"),
            min(when($"treated" === 0 && $"post" === 1, $"mean_micro"))
              .as("mean_c_post"))
          .select($"event_type", $"mean_t_pre", $"mean_t_post",
            $"mean_c_pre", $"mean_c_post",
            (($"mean_t_post" - $"mean_t_pre")
              - ($"mean_c_post" - $"mean_c_pre")).as("did_micro"))
      },
      Some("""WITH d0 AS (
          SELECT epoch_us(CAST(date_trunc('day', MIN(ts)) AS TIMESTAMP))
            AS t0_us FROM events),
        cell AS (
          SELECT event_type,
            CASE WHEN substr(md5('did|' || CAST(user_id AS VARCHAR)), 1, 1)
                 IN ('0','1','2','3','4','5','6','7') THEN 1 ELSE 0 END
              AS treated,
            CASE WHEN epoch_us(ts) >= t0_us + 1296000000000
                 THEN 1 ELSE 0 END AS post,
            CAST(floor(value * 1000000) AS BIGINT) AS v
          FROM events CROSS JOIN d0),
        m AS (
          SELECT event_type, treated, post,
            CAST(SUM(CAST(v AS HUGEINT)) // COUNT(*) AS BIGINT)
              AS mean_micro
          FROM cell GROUP BY 1, 2, 3)
        SELECT event_type,
          MIN(CASE WHEN treated=1 AND post=0 THEN mean_micro END)
            AS mean_t_pre,
          MIN(CASE WHEN treated=1 AND post=1 THEN mean_micro END)
            AS mean_t_post,
          MIN(CASE WHEN treated=0 AND post=0 THEN mean_micro END)
            AS mean_c_pre,
          MIN(CASE WHEN treated=0 AND post=1 THEN mean_micro END)
            AS mean_c_post,
          (MIN(CASE WHEN treated=1 AND post=1 THEN mean_micro END)
           - MIN(CASE WHEN treated=1 AND post=0 THEN mean_micro END))
          - (MIN(CASE WHEN treated=0 AND post=1 THEN mean_micro END)
           - MIN(CASE WHEN treated=0 AND post=0 THEN mean_micro END))
            AS did_micro
        FROM m GROUP BY event_type""")),

    // ------------------------------------------------------------------
    // Embedding drift monitor: per label, the squared distance (in
    // micro-mean units) between the centroid of the even-id half and
    // the odd-id half of the corpus — the distribution-shift check a
    // pipeline runs between ingestion batches before trusting a
    // frozen ANN index or classifier on new data. Components are
    // floor-quantized micro means (integer div — engine-exact), so
    // the drift is an associative integer sum; max per-dimension
    // drift localizes WHICH component moved. One (half, label, pos)
    // aggregation over the posexplode — map-side combined,
    // centroid-table-sized join only.
    Q("sim_embedding_drift",
      (s, d) => {
        import s.implicits._
        val q = Tables.embeddings(s, d)
          .select(($"vec_id" % 2).as("half"), $"label",
            posexplode($"embedding"))
          .toDF("half", "label", "pos", "e")
          .select($"half", $"label", $"pos",
            floor($"e".cast("double") * 1000000).cast("long").as("qv"))
        val cent = q.groupBy($"half", $"label", $"pos")
          .agg(count(lit(1)).as("n"), sum($"qv").as("sq"))
          .select($"half", $"label", $"pos", $"n",
            expr("sq div n").as("mean_micro"))
        val a = cent.filter($"half" === 0)
          .select($"label", $"pos", $"n".as("n_a"),
            $"mean_micro".as("ma"))
        val b = cent.filter($"half" === 1)
          .select($"label".as("lb"), $"pos".as("pb"), $"n".as("n_b"),
            $"mean_micro".as("mb"))
        a.join(b, $"label" === $"lb" && $"pos" === $"pb")
          .select($"label", $"pos", $"n_a", $"n_b",
            ($"ma" - $"mb").as("dm"))
          .groupBy($"label".cast("long").as("label"))
          .agg(min($"n_a").as("n_a"), min($"n_b").as("n_b"),
            sum($"dm" * $"dm").as("drift_sq_micro2"),
            max(abs($"dm")).as("max_dim_drift_micro"))
      },
      Some("""WITH q AS (
          SELECT vec_id % 2 AS half, label, g.i - 1 AS pos,
            CAST(floor(CAST(embedding[g.i] AS DOUBLE) * 1000000) AS BIGINT)
              AS qv
          FROM embeddings
          CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i) g),
        cent AS (
          SELECT half, label, pos, COUNT(*) AS n,
            CAST(SUM(qv) // COUNT(*) AS BIGINT) AS mean_micro
          FROM q GROUP BY 1, 2, 3),
        delta AS (
          SELECT a.label, a.pos, a.mean_micro - b.mean_micro AS dm,
            a.n AS n_a, b.n AS n_b
          FROM cent a JOIN cent b
            ON a.label = b.label AND a.pos = b.pos
              AND a.half = 0 AND b.half = 1)
        SELECT CAST(label AS BIGINT) AS label,
          MIN(n_a) AS n_a, MIN(n_b) AS n_b,
          CAST(SUM(dm * dm) AS BIGINT) AS drift_sq_micro2,
          CAST(MAX(abs(dm)) AS BIGINT) AS max_dim_drift_micro
        FROM delta GROUP BY label""")),

    // ------------------------------------------------------------------
    // DSIR importance weights (hashed-bigram importance resampling):
    // target domain = lang 'en'; per 64-bucket hashed bigram feature,
    // the Laplace-smoothed target share w = (n_target+1)*10^6 div
    // (n_all+1); a document's importance is its tf-weighted mean
    // weight in exact ppm. Plan: one bigram explode feeds BOTH
    // aggregations (the 64-row weight table — broadcast back — and
    // the per-(doc,bucket) tf); no second corpus pass. Integer
    // bounds: n_all*10^6 holds to ~9*10^12 bigrams per bucket in
    // int64 — beyond that the weight table is 64 rows, so the
    // DECIMAL upgrade is free (documented, not needed at any sf
    // here).
    Q("txt_dsir_weights",
      (s, d) => {
        import s.implicits._
        // Strict pipe-joined bigrams from the persisted TextIndex
        // (w2 IS NOT NULL ≡ the size >= 2 guard of the inline
        // transform) — `hashed` feeds both aggregations below.
        val hashed = TextIndex.bigrams(s, d)
          .filter($"w2".isNotNull)
          .select($"doc_id", $"lang",
            (conv(substring(md5(concat($"w1", lit("|"), $"w2")), 1, 4),
              16, 10).cast("long") % 64).as("bucket"))
        val wt = hashed.groupBy($"bucket")
          .agg(((sum(when($"lang" === "en", 1L).otherwise(0L)) + 1L)
              * 1000000L).as("num"),
            (count(lit(1)) + 1L).as("den"))
          .select($"bucket", expr("num div den").as("w_ppm"))
        hashed.groupBy($"doc_id", $"bucket")
          .agg(count(lit(1)).as("tf"))
          .join(broadcast(wt), "bucket")
          .groupBy($"doc_id")
          .agg(sum($"tf").as("n_bigrams"),
            sum($"tf" * $"w_ppm").as("imp_ppm_sum"))
          .select($"doc_id", $"n_bigrams", $"imp_ppm_sum",
            expr("imp_ppm_sum div n_bigrams").as("imp_ppm"))
      },
      Some("""WITH toks AS (
          SELECT doc_id, lang,
            string_split_regex(trim(lower(text)), '\s+') AS t
          FROM documents),
        hashed AS (
          SELECT doc_id, lang,
            ((instr('0123456789abcdef', substr(h, 1, 1)) - 1) * 4096
           + (instr('0123456789abcdef', substr(h, 2, 1)) - 1) * 256
           + (instr('0123456789abcdef', substr(h, 3, 1)) - 1) * 16
           + (instr('0123456789abcdef', substr(h, 4, 1)) - 1)) % 64
              AS bucket
          FROM (
            SELECT doc_id, lang,
              substr(md5(t[i] || '|' || t[i + 1]), 1, 4) AS h
            FROM toks,
              LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i)
            ) b),
        wt AS (
          SELECT bucket,
            (CAST(COUNT(CASE WHEN lang = 'en' THEN 1 END) AS BIGINT) + 1)
              * 1000000 // (CAST(COUNT(*) AS BIGINT) + 1) AS w_ppm
          FROM hashed GROUP BY bucket),
        per_doc AS (
          SELECT doc_id, bucket, COUNT(*) AS tf
          FROM hashed GROUP BY doc_id, bucket)
        SELECT p.doc_id,
          CAST(SUM(p.tf) AS BIGINT) AS n_bigrams,
          CAST(SUM(p.tf * w.w_ppm) AS BIGINT) AS imp_ppm_sum,
          CAST(SUM(p.tf * w.w_ppm) // SUM(p.tf) AS BIGINT) AS imp_ppm
        FROM per_doc p JOIN wt w USING (bucket)
        GROUP BY p.doc_id""")),

    // ------------------------------------------------------------------
    // SemDeDup (Abbas et al. 2023): semantic dedup scoped to coarse
    // k-means cells — assign every vector to its nearest of the 16
    // deterministic centroids (broadcast, narrow map), then compare
    // pairs WITHIN a cell only (the paper's move that turns n^2 into
    // k * (n/k)^2 — at 10^9 vectors k grows with the corpus so the
    // cell stays constant-sized). Within a >0.95-cosine pair the
    // member MORE similar to its centroid is removed (the paper
    // keeps low-centroid-similarity examples — they carry the most
    // marginal information); exact twins tie on centroid cosine and
    // fall to the vec_id order. Corpus is the neardup-planted
    // augmentation (every 20th vector duplicated at +100000) so the
    // verdict provably catches the planted twins (spec-pinned).
    Q("dedup_semdedup",
      (s, d) => {
        import s.implicits._
        val emb = Tables.embeddings(s, d).select($"vec_id", $"embedding")
        val m = assign(augmented(emb), centroids(emb))
        val removed = cellPairs(m)
          .select(when($"ca" > $"cb", $"va").when($"cb" > $"ca", $"vb")
            .when($"va" > $"vb", $"va").otherwise($"vb").as("vec_id"))
          .distinct()
        m.join(removed.withColumn("r", lit(1L)), Seq("vec_id"), "left_outer")
          .select($"vec_id", $"cid", coalesce($"r", lit(0L)).as("removed"))
      },
      Some(s"""WITH $augSql,
        $assignSql,
        $cellPairsSql,
        removed AS (
          SELECT DISTINCT CASE WHEN ca > cb THEN va
                  WHEN cb > ca THEN vb
                  WHEN va > vb THEN va ELSE vb END AS vec_id
          FROM dup_pairs)
        SELECT m.vec_id, m.cid,
          CAST(CASE WHEN r.vec_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
            AS removed
        FROM assign m LEFT JOIN removed r ON m.vec_id = r.vec_id""")),

    // ------------------------------------------------------------------
    // SemDeDup recall eval: what does cell-scoping LOSE? Truth =
    // label-blocked all-pairs >0.95 (the sim_embedding_neardup
    // device — exact within each label block); caught = the same
    // pair found in one coarse cell. Per label: pair counts and
    // exact recall in permille — the number that tells you whether
    // 16 cells is enough before the pass runs at 10^9 vectors (the
    // paper's k-vs-recall dial, measured on this corpus). A pair is
    // missed exactly when the quantizer splits twins across cells.
    Q("dedup_semdedup_recall",
      (s, d) => {
        import s.implicits._
        val emb = Tables.embeddings(s, d)
          .select($"vec_id", $"label", $"embedding")
        val aug = augmented(emb)
        val m = assign(aug.drop("label"), centroids(emb))
        val caught = cellPairs(m).select($"va", $"vb", lit(1L).as("hit"))
        val a = aug.select($"vec_id".as("va"), $"label",
          $"embedding".as("ea"))
        val b = aug.select($"vec_id".as("vb"), $"label".as("lb"),
          $"embedding".as("eb"))
        val truth = a.join(b, $"label" === $"lb" && $"va" < $"vb")
          .filter(cosine($"ea", $"eb") > 0.95)
          .select($"label", $"va", $"vb")
        truth.join(caught, Seq("va", "vb"), "left_outer")
          .groupBy($"label")
          .agg(count(lit(1)).as("n_true"),
            sum(coalesce($"hit", lit(0L))).as("n_caught"))
          .select($"label".cast("long").as("label"), $"n_true", $"n_caught",
            expr("n_caught * 1000 div n_true").as("recall_permille"))
      },
      Some(s"""WITH $augSql,
        $assignSql,
        $cellPairsSql,
        truth AS (
          SELECT a.label, a.vec_id AS va, b.vec_id AS vb
          FROM aug a JOIN aug b
            ON a.label = b.label AND a.vec_id < b.vec_id
          WHERE ${dotSql("a.embedding", "b.embedding")} /
                (sqrt(${dotSql("a.embedding", "a.embedding")}) *
                 sqrt(${dotSql("b.embedding", "b.embedding")})) > 0.95)
        SELECT CAST(t.label AS BIGINT) AS label,
          COUNT(*) AS n_true,
          CAST(SUM(CASE WHEN p.va IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
            AS n_caught,
          CAST(SUM(CASE WHEN p.va IS NOT NULL THEN 1 ELSE 0 END) * 1000
            // COUNT(*) AS BIGINT) AS recall_permille
        FROM truth t
        LEFT JOIN dup_pairs p ON p.va = t.va AND p.vb = t.vb
        GROUP BY t.label""")),

    // ------------------------------------------------------------------
    // Maximum-inner-product top-k: recommendation scoring ranks by
    // RAW dot product, not cosine (a popular item with a long vector
    // SHOULD outrank a short well-aligned one — normalizing away
    // magnitude is exactly wrong for MIPS). Score is the quantized
    // integer dot (FloatVecDotQ: associative integer term-sums), so
    // the exported ranking AND score are engine-exact with no IEEE
    // tie risk at all — the one retrieval query here whose score
    // column is bit-stable by construction rather than by margin.
    // Same broadcast(queries) x corpus scan as sim_cosine_topk; the
    // IVF/LSH paths replace the scan at 10^9 vectors.
    Q("sim_mips_topk",
      (s, d) => {
        import s.implicits._
        val emb = Tables.embeddings(s, d).select($"vec_id", $"embedding")
        val queries = emb.filter($"vec_id" % 97 === 0)
          .select($"vec_id".as("qid"), $"embedding".as("qemb"))
        val w = Window.partitionBy($"qid")
          .orderBy($"dot_q".desc, $"vec_id")
        emb.crossJoin(broadcast(queries))
          .filter($"vec_id" =!= $"qid")
          .withColumn("dot_q", graft.functions.NativeFunctions
            .floatVecDotQ($"qemb", $"embedding"))
          .withColumn("rank", row_number().over(w))
          .filter($"rank" <= 5)
          .select($"qid", $"rank", $"vec_id".as("neighbor_id"), $"dot_q")
      },
      Some("""WITH q AS (
          SELECT vec_id AS qid, embedding AS qemb FROM embeddings
          WHERE vec_id % 97 = 0),
        scored AS (
          SELECT q.qid, e.vec_id,
            CAST((SELECT SUM(CAST(floor(CAST(q.qemb[i] AS DOUBLE) *
                  CAST(e.embedding[i] AS DOUBLE) * 1000000000.0) AS BIGINT))
             FROM generate_series(1, 64) t(i)) AS BIGINT) AS dot_q
          FROM embeddings e, q WHERE e.vec_id <> q.qid)
        SELECT qid, rank, vec_id AS neighbor_id, dot_q FROM (
          SELECT qid, vec_id, dot_q,
            ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dot_q DESC, vec_id)
              AS rank
          FROM scored) t WHERE rank <= 5""")),

    // ------------------------------------------------------------------
    // IVF index health: cell-population skew of the coarse quantizer.
    // imbalance = max_cell / mean_cell (ppm) — the tail-latency
    // multiplier a hot probe pays; load_factor = k * sum(n^2) / N^2
    // (ppm) — expected per-query scan cost relative to perfectly
    // uniform cells (1.0 = uniform). Both exact integer ppm with the
    // squared sums in DECIMAL(38,0) (sum(n^2) * k * 10^6 overflows
    // int64 once cells hold ~10^8 vectors). One narrow assignment
    // map + a 16-row aggregate.
    Q("sim_ivf_imbalance",
      (s, d) => {
        import s.implicits._
        val emb = Tables.embeddings(s, d).select($"vec_id", $"embedding")
        assign(emb, centroids(emb))
          .groupBy($"cid").agg(count(lit(1)).as("n"))
          .agg(count(lit(1)).as("n_cells"), sum($"n").as("n_vecs"),
            min($"n").as("min_cell"), max($"n").as("max_cell"),
            sum($"n" * $"n").as("ss"))
          .select($"n_cells", $"n_vecs", $"min_cell", $"max_cell",
            expr("(cast(max_cell as decimal(38,0)) * n_cells * 1000000)" +
              " div n_vecs").as("imbalance_ppm"),
            expr("(cast(ss as decimal(38,0)) * n_cells * 1000000)" +
              " div (cast(n_vecs as decimal(38,0)) * n_vecs)")
              .as("load_factor_ppm"))
      },
      Some(s"""WITH aug AS (
          SELECT vec_id, embedding FROM embeddings),
        $assignSql,
        cells AS (SELECT cid, COUNT(*) AS n FROM assign GROUP BY cid)
        SELECT COUNT(*) AS n_cells,
          CAST(SUM(n) AS BIGINT) AS n_vecs,
          MIN(n) AS min_cell, MAX(n) AS max_cell,
          CAST(MAX(n) * COUNT(*) * 1000000 // SUM(n) AS BIGINT)
            AS imbalance_ppm,
          CAST(SUM(n * n) * COUNT(*) * 1000000 // (SUM(n) * SUM(n))
            AS BIGINT) AS load_factor_ppm
        FROM cells"""))
  )
}
