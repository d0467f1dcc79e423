package graft.index

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.{forAll, propBoolean}

import graft.index.Intervals._

/** Property suite for the intervals algebra: minimize() is a containment
  * antichain that under-approximates nothing, and IMatch existence agrees
  * with brute-force enumeration over random small position maps.
  */
object IntervalsProps extends Properties("Intervals") {

  private val posMap: Gen[Map[String, Array[Int]]] =
    for {
      na <- Gen.chooseNum(0, 8)
      nb <- Gen.chooseNum(0, 8)
      as <- Gen.listOfN(na, Gen.chooseNum(0, 30))
      bs <- Gen.listOfN(nb, Gen.chooseNum(0, 30))
    } yield {
      // distinct terms can't share a position in a real token stream
      val a = as.distinct.sorted
      val b = bs.distinct.sorted.filterNot(a.contains)
      Map("a" -> a.toArray, "b" -> b.toArray).filter(_._2.nonEmpty)
    }

  private val intervals: Gen[Seq[(Int, Int)]] =
    Gen.listOf(for {
      s <- Gen.chooseNum(0, 20)
      w <- Gen.chooseNum(0, 10)
    } yield (s, s + w))

  property("minimize yields a containment antichain") = forAll(intervals) { xs =>
    val m = minimize(xs)
    m.indices.forall { i =>
      m.indices.forall { j =>
        i == j || !(m(i)._1 <= m(j)._1 && m(i)._2 >= m(j)._2)
      }
    }
  }

  property("every input interval contains some minimized interval") =
    forAll(intervals) { xs =>
      val m = minimize(xs)
      xs.forall(x => m.exists(y => x._1 <= y._1 && y._2 <= x._2))
    }

  property("ordered match existence == brute chain") = forAll(
    posMap, Gen.chooseNum(-1, 8)) { (pos, gaps) =>
    (pos.contains("a") && pos.contains("b")) ==> {
      val got = eval(IMatch("a b", maxGaps = gaps, ordered = true), pos).nonEmpty
      val want = pos("a").exists(x => pos("b").exists(y =>
        y > x && (gaps < 0 || (y - x + 1) - 2 <= gaps)))
      got == want
    }
  }

  property("unordered match existence == brute window") = forAll(
    posMap, Gen.chooseNum(-1, 8)) { (pos, gaps) =>
    (pos.contains("a") && pos.contains("b")) ==> {
      val got = eval(IMatch("a b", maxGaps = gaps, ordered = false), pos).nonEmpty
      val want = pos("a").exists(x => pos("b").exists(y =>
        gaps < 0 || (math.max(x, y) - math.min(x, y) + 1) - 2 <= gaps))
      got == want
    }
  }

  property("ordered intervals are minimal: no interval contains another; " +
    "each is a genuine chain") = forAll(posMap) { pos =>
    (pos.contains("a") && pos.contains("b")) ==> {
      val ivs = eval(IMatch("a b", ordered = true), pos)
      val antichain = ivs.indices.forall(i => ivs.indices.forall(j =>
        i == j || !(ivs(i)._1 <= ivs(j)._1 && ivs(i)._2 >= ivs(j)._2)))
      val genuine = ivs.forall { case (s, e) =>
        pos("a").contains(s) && pos("b").contains(e) && e > s
      }
      antichain && genuine
    }
  }
}
