package graft.index

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.core.{Blocks, PostingBlock}
import graft.model.TermFreqRow

/** A TF row with its doc-range salt (SURVEY.md §2 row 9). */
final case class SaltedTf(term: String, salt: Int, doc_id: Long, tf: Int, dl: Int)

/** Head-term salt planner. Exact df (already computed by TermFreqs.termStats)
  * drives a per-term fan-out s(t) = ceil(df/targetRun); the salt is
  * **docID-range based** — `salt = min(s−1, doc_id·s / docIdSpace)` — so the
  * salted sub-runs of a term cover disjoint ascending docID ranges and the
  * term-keyed merge is pure concatenation (no re-encode, SURVEY.md §7.3-3).
  *
  * Why not AQE: adaptive execution splits skewed *join* partitions but does
  * not fix groupBy/repartition key skew — a term with 10^10 postings would
  * still land on one reducer. Salting bounds every (term, salt) group to
  * ≤ ~2·targetRun postings regardless of df.
  */
object SaltPlan {

  final case class HeavyTerm(term: String, fanout: Int)

  /** Heavy-hitter table: tiny (only terms with df > targetRun), broadcast. */
  def heavyTerms(termStats: Dataset[graft.model.TermStat], targetRun: Long): Dataset[HeavyTerm] = {
    import termStats.sparkSession.implicits._
    termStats
      .filter($"df" > targetRun)
      .select($"term", ceil($"df".cast("double") / targetRun.toDouble).cast("int").as("fanout"))
      .as[HeavyTerm]
  }

  /** Attach salts. `docIdSpace` = max(doc_id)+1 (dense corpora: = nDocs). */
  def salt(
      tf: Dataset[TermFreqRow],
      heavy: Dataset[HeavyTerm],
      docIdSpace: Long): Dataset[SaltedTf] = {
    import tf.sparkSession.implicits._
    tf.join(broadcast(heavy), Seq("term"), "left")
      .select(
        $"term",
        when($"fanout".isNull, lit(0))
          .otherwise(least($"fanout" - 1,
            ($"doc_id" * $"fanout" / lit(docIdSpace)).cast("int")))
          .cast("int").as("salt"),
        $"doc_id", $"tf", $"dl")
      .as[SaltedTf]
  }
}

/** SPIMI-style per-partition posting-run construction (SURVEY.md §2 row 10;
  * IIR §4.3): one salted shuffle keyed by (term, salt), partition-local sort
  * on (term, salt, doc_id), then a streaming O(block)-memory encoder. Heavy
  * terms cross any later stage pre-compressed.
  */
object Spimi {

  def buildBlocks(
      salted: Dataset[SaltedTf],
      avgdl: Double,
      buckets: Int,
      numPartitions: Int): Dataset[PostingBlock] = {
    import salted.sparkSession.implicits._
    salted
      .repartition(numPartitions, $"term", $"salt")
      .sortWithinPartitions($"term", $"salt", $"doc_id")
      .mapPartitions(rows => new SpimiIterator(rows, avgdl, buckets))
  }

  /** Lazy per-partition encoder: detects (term, salt) group boundaries in the
    * sorted row stream and feeds a Blocks.Accumulator; never holds more than
    * one partial block + a ≤2-element pending queue in memory.
    */
  private final class SpimiIterator(
      rows: Iterator[SaltedTf],
      avgdl: Double,
      buckets: Int) extends Iterator[PostingBlock] {

    private val pending = new java.util.ArrayDeque[PostingBlock](4)
    private var acc: Blocks.Accumulator = _
    private var curTerm: String = _
    private var curSalt: Int = -1

    private def fill(): Unit = {
      while (pending.isEmpty && rows.hasNext) {
        val r = rows.next()
        if (acc == null || r.term != curTerm || r.salt != curSalt) {
          if (acc != null) acc.flush().foreach(pending.add)
          acc = new Blocks.Accumulator(r.term, r.salt, avgdl, buckets)
          curTerm = r.term
          curSalt = r.salt
        }
        acc.add(r.doc_id, r.tf, r.dl).foreach(pending.add)
      }
      if (pending.isEmpty && !rows.hasNext && acc != null) {
        acc.flush().foreach(pending.add)
        acc = null
      }
    }

    override def hasNext: Boolean = { fill(); !pending.isEmpty }
    override def next(): PostingBlock = { fill(); pending.poll() }
  }
}
