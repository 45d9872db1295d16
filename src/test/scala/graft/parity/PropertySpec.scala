package graft.parity

import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants from the reference's "FIXED:" docstrings
  * (SURVEY.md §5): positional-merge safety and fold shape guarantees.
  */
class PropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private val cell: Gen[String] =
    Gen.oneOf(Gen.const("-"), Gen.choose(0, 99999).map(_.toString))
  private val cells: Gen[List[String]] = Gen.choose(0, 7).flatMap(Gen.listOfN(_, cell))

  test("merge: result is exactly 5 slots when continuation present") {
    check(Prop.forAll(cells, cells.suchThat(_.nonEmpty)) { (base, cont) =>
      RefText.mergePositionalData(base, cont).length == 5
    })
  }

  test("merge: non-dash base slots are never overwritten") {
    check(Prop.forAll(cells, cells) { (base, cont) =>
      val out = RefText.mergePositionalData(base, cont)
      val padded = (base ++ Seq.fill(math.max(0, 5 - base.length))("-")).take(5)
      padded.zip(out).forall { case (b, o) => b == "-" || o == b }
    })
  }

  test("merge: dash continuation values consume a slot without writing") {
    // A '-' in the continuation moves the cursor but leaves the slot empty:
    // merging ["-"] into all-dashes changes nothing.
    check(Prop.forAll(Gen.choose(1, 5)) { n =>
      RefText.mergePositionalData(Seq.fill(5)("-"), Seq.fill(n)("-"))
        .forall(_ == "-")
    })
  }

  test("merge: values fill leftmost empty slots in order") {
    check(Prop.forAll(cells.suchThat(_.nonEmpty)) { cont =>
      val out = RefText.mergePositionalData(Seq.fill(5)("-"), cont)
      val expected = cont.take(5).padTo(5, "-")
      out.toSeq == expected
    })
  }

  private val lineText: Gen[String] = Gen.oneOf(
    Gen.const("Seymour Grady, 25, -, -"),
    Gen.const("800, 40, 150"),
    Gen.choose(0, 99999).map(_.toString),
    Gen.const("Wayne County West Virginia"),
    Gen.const("x 450 smudge"),
    for {
      name <- Gen.oneOf("John Smith", "A. B. Stemple", "Robt. Hall Jr.")
      nums <- Gen.choose(0, 6).flatMap(Gen.listOfN(_, cell))
    } yield (name +: nums).mkString(", "))

  private val lines: Gen[List[RecordFold.Line]] =
    Gen.choose(0, 30).flatMap(n => Gen.listOfN(n, for {
      t   <- lineText
      top <- Gen.choose(0, 1000).map(_ / 1000.0)
    } yield RecordFold.Line(t, 1, top, 0.1, 0L))).map(
      _.zipWithIndex.map { case (l, i) => l.copy(seq = i.toLong) })

  test("fold: every record has exactly 5 numbers and a nonempty name") {
    check(Prop.forAll(lines) { ls =>
      RecordFold.foldColumn(ls).forall(r =>
        r.numbers.length == 5 && r.name.nonEmpty)
    })
  }

  test("fold: record count equals name-line count when first line is a name") {
    check(Prop.forAll(lines) { ls =>
      val sorted = ls.sortBy(l => (l.top, l.seq))
      val nameCount = sorted.count(l => RefText.startsWithName(l.text.trim))
      val parsedEmpty = sorted.filter(l => RefText.startsWithName(l.text.trim))
        .count(l => RefText.parseStructuredLine(l.text.trim)._1.isEmpty)
      RecordFold.foldColumn(ls).size == nameCount - parsedEmpty
    })
  }

  test("fold: permutation invariance (order restored by sort keys)") {
    check(Prop.forAll(lines) { ls =>
      val shuffled = scala.util.Random.shuffle(ls)
      RecordFold.foldColumn(shuffled) == RecordFold.foldColumn(ls)
    })
  }
}
