package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BoundReference, Levenshtein, Literal}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants for the engine's custom functions — all
  * at the expression/buffer level (no Spark session, so hundreds of
  * random cases run in milliseconds).
  */
class FunctionPropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  // ------------------------------------------------------------------
  // MinMd5Window vs a direct code-point reference implementation.

  private def refMinMd5(s: String, k: Int): String = {
    val cps = s.codePoints().toArray
    val n = math.max(cps.length - k + 1, 1)
    (0 until n).map { i =>
      val w = new String(cps, i, math.min(k, cps.length - i))
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(w.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      d.map(b => f"${b & 0xff}%02x").mkString
    }.min
  }

  private val anyText: Gen[String] = Gen.oneOf(
    Gen.listOf(Gen.alphaNumChar).map(_.mkString),
    // "😀" is supplementary (a surrogate pair): byte and UTF-16
    // windows both diverge from code-point windows around it.
    Gen.listOf(Gen.oneOf("a", "b", " ", "é", "ß", "中", "😀"))
      .map(_.mkString))

  test("minMd5Window matches the brute-force code-point form") {
    check(Prop.forAll(anyText, Gen.choose(1, 12)) { (s, k) =>
      HashImpls.minMd5Window(s, k) == refMinMd5(s, k)
    })
  }

  // ------------------------------------------------------------------
  // RollingModCount vs a quadratic per-window recompute.

  private def refModCount(s: String, k: Int, div: Long): Long = {
    val cps = s.codePoints().toArray
    if (cps.length < k) return 0L
    (0 to cps.length - k).count { i =>
      var h = 0L
      for (j <- i until i + k) h = (h * 31L + cps(j)) % 1000000007L
      h % div == 0L
    }.toLong
  }

  test("rollingModCount matches the quadratic window recompute") {
    check(Prop.forAll(anyText, Gen.choose(1, 12),
        Gen.oneOf(2L, 16L, 64L)) { (s, k, div) =>
      HashImpls.rollingModCount(s, k, div) == refModCount(s, k, div)
    })
  }

  // ------------------------------------------------------------------
  // RollingHashAll vs a quadratic per-window recompute, and its
  // contract with RollingMinHash (min of all == the fused min).

  private def refHashAll(s: String, k: Int): Seq[Long] = {
    val cps = s.codePoints().toArray
    if (cps.length < k) return Seq.empty
    (0 to cps.length - k).map { i =>
      var h = 0L
      for (j <- i until i + k) h = (h * 31L + cps(j)) % 1000000007L
      h
    }
  }

  test("rollingHashAll matches the quadratic window recompute") {
    check(Prop.forAll(anyText, Gen.choose(1, 12)) { (s, k) =>
      HashImpls.rollingHashAll(s, k).toSeq == refHashAll(s, k)
    })
  }

  test("rollingHashAll min equals rollingMinHash") {
    check(Prop.forAll(anyText, Gen.choose(1, 12)) { (s, k) =>
      val all = HashImpls.rollingHashAll(s, k)
      val fused = HashImpls.rollingMinHash(s, k)
      if (all.isEmpty) fused == null else fused == all.min
    })
  }

  // ------------------------------------------------------------------
  // SpaceSaving buffer: exactness under capacity, bounds over it,
  // merge-order robustness.

  private def sketch(values: Seq[String], k: Int, capacity: Int,
                     parts: Int, seed: Long) = {
    val agg = ApproxTopK(BoundReference(0, StringType, nullable = true),
      k, capacity)
    val rnd = new scala.util.Random(seed)
    val buffers = Seq.fill(parts)(agg.createAggregationBuffer())
    for (v <- values)
      agg.update(buffers(rnd.nextInt(parts)),
        new GenericInternalRow(Array[Any](UTF8String.fromString(v))))
    val merged = rnd.shuffle(buffers).reduce(agg.merge)
    agg.eval(merged)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.GenericArrayData]
      .array.toSeq.map { r =>
        val row = r.asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
        (row.getUTF8String(0).toString, row.getLong(1), row.getLong(2))
      }
  }

  private val stream: Gen[Seq[String]] = for {
    domain <- Gen.choose(1, 30)
    n <- Gen.choose(1, 400)
    vs <- Gen.listOfN(n, Gen.choose(0, domain - 1).map(i => f"v$i%02d"))
  } yield vs

  test("approx_top_k: exact counts when capacity covers the domain") {
    check(Prop.forAll(stream, Gen.choose(1, 6), Gen.choose(1L, 999L)) {
      (vs, parts, seed) =>
        val truth = vs.groupBy(identity).view.mapValues(_.size.toLong)
        val got = sketch(vs, 3, 32, parts, seed)
        val want = truth.toSeq.sortBy { case (v, c) => (-c, v) }.take(3)
          .map { case (v, c) => (v, c, 0L) }
        got == want
    })
  }

  test("approx_top_k: est-err <= true <= est in the sketch regime") {
    check(Prop.forAll(stream, Gen.choose(1, 6), Gen.choose(1L, 999L)) {
      (vs, parts, seed) =>
        val truth = vs.groupBy(identity).view.mapValues(_.size.toLong).toMap
        sketch(vs, 3, 8, parts, seed).forall { case (v, est, err) =>
          val t = truth.getOrElse(v, 0L)
          t <= est && est - err <= t
        }
    })
  }

  // ------------------------------------------------------------------
  // The levenshtein-threshold rewrite's soundness: Spark's
  // three-argument form agrees with every comparison of the true
  // distance — the exact equivalences LevenshteinThresholdRule emits.

  private def refLev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private val word: Gen[String] =
    Gen.listOf(Gen.oneOf('a', 'b', 'c')).map(_.mkString)

  test("banded levenshtein agrees with every true-distance comparison") {
    check(Prop.forAll(word, word, Gen.choose(1, 5)) { (a, b, k) =>
      val banded = Levenshtein(Literal(a), Literal(b), Some(Literal(k)))
        .eval(null).asInstanceOf[Int]
      val d = refLev(a, b)
      ((d <= k) == (banded >= 0)) && ((d > k) == (banded == -1))
    })
  }
}
