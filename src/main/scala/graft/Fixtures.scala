package graft

import java.sql.Timestamp
import java.util.Random

import graft.model.Turn

/** Deterministic in-code transcript synthesis (FIXTURES.md §T): the
  * north-rule input shape, seed-stable per conversation (seed = 42 ⊕ conv)
  * so partition order never affects content and any conversation regenerates
  * independently.
  */
object Fixtures {

  val Tools = Array("Bash", "Read", "Write", "Grep", "Edit")
  private val VocabSize = 1000
  private val ZipfS = 1.07
  private val baseTs = java.time.Instant.parse("2026-01-01T00:00:00Z").toEpochMilli

  // cumulative Zipf(s=1.07) over ranks 1..1000
  private val zipfCum: Array[Double] = {
    val w = (1 to VocabSize).map(r => 1.0 / math.pow(r, ZipfS)).toArray
    val tot = w.sum
    val cum = new Array[Double](VocabSize)
    var acc = 0.0
    var i = 0
    while (i < VocabSize) { acc += w(i) / tot; cum(i) = acc; i += 1 }
    cum(VocabSize - 1) = 1.0
    cum
  }

  private def zipfDraw(rng: Random): Int = {
    val u = rng.nextDouble()
    val i = java.util.Arrays.binarySearch(zipfCum, u)
    if (i >= 0) i else -i - 1
  }

  def term(rank: Int): String = f"t$rank%05d"

  /** One conversation's turns; pure function of (conv, turnsPerConv). */
  def conversation(conv: Int, turnsPerConv: Int): Seq[Turn] = {
    val rng = new Random(42L ^ conv.toLong)
    val convId = f"c$conv%06d"
    (0 until turnsPerConv).map { ti =>
      val globalTurn = conv.toLong * turnsPerConv + ti
      val toolTurn = ti % 7 == 6
      val role =
        if (ti == 0) "system"
        else if (toolTurn) "assistant"
        else if (ti % 2 == 1) "user"
        else "assistant"
      val tool = if (toolTurn) Tools(rng.nextInt(Tools.length)) else ""
      val g = rng.nextInt(90)
      val nTokens = 10 + g
      val words = new StringBuilder
      var w = 0
      while (w < nTokens) {
        if (w > 0) words.append(' ')
        words.append(term(zipfDraw(rng)))
        w += 1
      }
      if (ti % 50 == 0) words.append(' ').append(convId).append("-mark")
      // 13s per global turn; extra 30-min gap every 200 turns within a conv
      val gapMs = (ti / 200).toLong * 30L * 60 * 1000
      Turn(convId, ti, role, words.toString, tool,
        new Timestamp(baseTs + globalTurn * 13000L + gapMs))
    }
  }

  def turns(convs: Int, turnsPerConv: Int): Seq[Turn] =
    (0 until convs).flatMap(conversation(_, turnsPerConv))

  /** sf-unit: 20×25 = 500 turns (per-operator suites). */
  def sfUnit: Seq[Turn] = turns(20, 25)

  /** sf-test: 100×50 = 5000 turns (end-to-end oracle chain). */
  def sfTest: Seq[Turn] = turns(100, 50)

  /** Reference query set over transcripts (FIXTURES.md §Q): drawn
    * deterministically — 5 head-only, 5 tail-only, 5 mixed 2–4 terms,
    * 3 with one absent term, 2 conv-marker hits.
    */
  def refQueries: Seq[Seq[String]] = {
    val rng = new Random(4242L)
    def head = term(rng.nextInt(10))
    def tail = term(900 + rng.nextInt(100))
    val headOnly = Seq.fill(5)(Seq(head))
    val tailOnly = Seq.fill(5)(Seq(tail))
    val mixed = Seq.fill(5) {
      val n = 2 + rng.nextInt(3)
      Seq.fill(n)(if (rng.nextBoolean()) head else tail)
    }
    val withAbsent = Seq.fill(3)(Seq(head, "zzzabsent"))
    val markers = Seq.fill(2)(Seq(f"c${rng.nextInt(100)}%06d-mark"))
    headOnly ++ tailOnly ++ mixed ++ withAbsent ++ markers
  }
}
