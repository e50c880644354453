package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.ml.TextIndex
import graft.ml.TextIndex.HashSplit

/** Property pins for the extendible-hash split genealogy
  * ([[graft.ml.TextIndex.descentTable]]): the residue table the engine
  * actually evaluates ([[graft.ml.TextIndex.splitLookup]] — one hash +
  * one pmod + one array index) must agree with the NAIVE per-hash
  * descent (start at `pmod(h, base)`, re-hash at the doubled modulus
  * whenever the current bucket is the one that split) for EVERY valid
  * genealogy and every hash value — the table is an optimization, and
  * these properties are the proof it is only that. Valid genealogies
  * are generated the only way the engine can make them: repeatedly
  * splitting a live bucket at its current local modulus (exactly
  * `splitBucket`/`splitIfHot`'s move). Raw ScalaCheck (no scalatest
  * bridge in the offline cache): `Test.check` + an assert on the
  * result. */
class SplitDescentSpec extends AnyFunSuite {
  private val Base = 16

  private def pmod(x: Int, m: Int): Int = {
    val r = x % m; if (r < 0) r + m else r
  }

  /** The naive reference descent, straight from the definition. */
  private def naive(h: Int, splits: Seq[HashSplit]): Int = {
    var b = pmod(h, Base)
    splits.foreach(s => if (b == s.parent) b = pmod(h, 2 * s.mod))
    b
  }

  /** A valid genealogy: each step splits one LIVE bucket (a base id or
    * a previous child — parents stay live) at its current local
    * modulus. */
  private val genealogyGen: Gen[Seq[HashSplit]] =
    for {
      n <- Gen.choose(0, 10)
      picks <- Gen.listOfN(n, Gen.choose(0, Int.MaxValue - 1))
    } yield picks.foldLeft(Seq.empty[HashSplit]) { (splits, pick) =>
      val live = ((0 until Base).toSet ++ splits.map(_.child)).toSeq.sorted
      val b = live(pick % live.size)
      val m = TextIndex.localModOf(splits, b, Base)
      splits :+ HashSplit(b, b + m, m)
    }

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(500), p)
    assert(res.passed, res.status.toString)
  }

  test("residue table == naive descent for every genealogy and hash") {
    check(Prop.forAll(genealogyGen,
        Gen.choose(Int.MinValue, Int.MaxValue)) { (splits, h) =>
      val table = TextIndex.descentTable(splits, Base)
      table(pmod(h, table.size)) == naive(h, splits)
    })
  }

  test("child ids are fresh and the table's range is exactly the live set") {
    check(Prop.forAll(genealogyGen) { splits =>
      val children = splits.map(_.child)
      // fresh: children never collide with base ids or each other
      children.distinct.size == children.size &&
        children.forall(_ >= Base) &&
        // total: the table maps residues onto exactly base ∪ children —
        // every live bucket keeps at least one residue (its own id mod
        // its final local modulus), and nothing else is reachable
        TextIndex.descentTable(splits, Base).toSet ==
          ((0 until Base).toSet ++ children)
    })
  }

  test("every genealogy modulus divides the table size (the arithmetic the table form rests on)") {
    check(Prop.forAll(genealogyGen) { splits =>
      val table = TextIndex.descentTable(splits, Base)
      val mMax = (Base +: splits.map(s => 2 * s.mod)).max
      table.size == mMax && splits.forall(s => mMax % (2 * s.mod) == 0)
    })
  }

  /** One bucket split to depth `d` — the fastest way to grow the max
    * local modulus (each split doubles it). */
  private def chainTo(depth: Int): Seq[HashSplit] =
    (0 until depth).foldLeft(Seq.empty[HashSplit]) { (splits, _) =>
      val m = TextIndex.localModOf(splits, 0, Base)
      splits :+ HashSplit(0, m, m)
    }

  test("genealogy depth bound (VERDICT r15 flag #2): the table sizes to the cap, then fails loudly") {
    // at the bound: 11 doublings of one bucket → local mod 32768 ==
    // MaxDescentEntries; the table sizes exactly to the cap and the
    // descent column still builds
    val atBound = chainTo(11)
    assert(TextIndex.localModOf(atBound, 0, Base)
      === TextIndex.MaxDescentEntries)
    assert(!TextIndex.canSplit(atBound, 0, Base),
      "an at-bound bucket must report unsplittable to the policy")
    assert(TextIndex.descentTable(atBound, Base).size
      === TextIndex.MaxDescentEntries)
    TextIndex.splitLookup(
      org.apache.spark.sql.functions.lit(7), atBound, Base) // must not throw
    // past the bound: splitLookup refuses the literal — the guard that
    // keeps a foreign-written genealogy from riding every task binary
    val past = chainTo(12)
    val e = intercept[IllegalArgumentException] {
      TextIndex.splitLookup(
        org.apache.spark.sql.functions.lit(7), past, Base)
    }
    assert(e.getMessage.contains("genealogy too deep"))
    // and canSplit is exactly the policy's skip predicate: every live
    // bucket below the bound stays splittable
    assert(TextIndex.canSplit(atBound, 1, Base),
      "an unsplit sibling bucket must remain splittable")
  }
}
