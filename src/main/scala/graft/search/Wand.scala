package graft.search

import scala.collection.mutable.ArrayBuffer

import graft.core._
import graft.model.Hit

/** Block-Max WAND top-k BM25 (SURVEY.md §2 row 15; Broder et al. CIKM 2003;
  * Ding & Suel SIGIR 2011).
  *
  * Single-shard document-at-a-time scorer over compressed posting blocks:
  * pivot selection on per-term upper bounds, shallow block skipping via
  * per-block `last_doc` + exact `max_tf_norm`, bounded k-heap.
  *
  * Rank-safety with the engine's tie order (score DESC, doc_id ASC):
  * all skip decisions use STRICT `< θ` (a doc scoring exactly θ could still
  * win its tie on doc_id, so equality is never skipped), and pivot selection
  * uses `≥ θ`. Scoring sums per-term contributions in sorted-term order —
  * bit-identical to the exhaustive scorer.
  */
object Wand {

  /** Cursor over one term's blocks within a shard. Blocks must be sorted by
    * first_doc and pairwise disjoint (guaranteed: docID-range salting).
    * Blocks are decoded lazily on entry; skipped blocks are never decoded.
    * `hi` restricts the cursor to docs < hi (shard upper bound) so blocks
    * spanning a shard boundary are not double-scored.
    */
  final class TermCursor(
      val idf: Double,
      blocks: Array[PostingBlock],
      avgdl: Double,
      hi: Long,
      robustBounds: Boolean = false) {

    /** Block upper bound. Exact mode uses the stored max_tf_norm (computed
      * at build time against the build avgdl). Robust mode recomputes the
      * bound from (max_tf, min_dl) against the CURRENT avgdl — required for
      * incrementally-grown indexes whose stored bounds were computed against
      * an older (smaller) avgdl and would under-estimate (tfNorm is monotone
      * increasing in tf, decreasing in dl, increasing in avgdl, so
      * tfNorm(max_tf, min_dl, avgdl_now) dominates every doc in the block).
      */
    @inline private def boundOf(b: PostingBlock): Double =
      if (robustBounds) idf * Bm25.tfNorm(b.max_tf, b.min_dl.toLong, avgdl)
      else idf * b.max_tf_norm

    private var bi = 0
    private var dec: DecodedBlock = _
    private var pos = 0
    var curDoc: Long = -1L

    /** Non-scoring conjunct (ES filter context): idf must be 0; set by
      * scoreShard from its `required` mask.
      */
    var required: Boolean = false

    /** Exact per-shard term upper bound. */
    val termUB: Double = {
      var m = 0.0
      var i = 0
      while (i < blocks.length) { val u = boundOf(blocks(i)); if (u > m) m = u; i += 1 }
      m
    }

    def exhausted: Boolean = curDoc == Long.MaxValue

    /** Position at first doc >= target (no-op if already there). */
    def seek(target: Long): Unit = {
      if (curDoc >= target) return
      while (bi < blocks.length && blocks(bi).last_doc < target) {
        bi += 1; dec = null; pos = 0
      }
      if (bi >= blocks.length) { curDoc = Long.MaxValue; return }
      if (dec == null) { dec = Blocks.decode(blocks(bi)); pos = 0 }
      while (pos < dec.docs.length && dec.docs(pos) < target) pos += 1
      // last_doc >= target guarantees a doc >= target exists in this block
      curDoc = dec.docs(pos)
      if (curDoc >= hi) curDoc = Long.MaxValue
    }

    /** Advance one posting. */
    def next(): Unit = {
      if (curDoc == Long.MaxValue) return
      pos += 1
      if (dec == null || pos >= dec.docs.length) {
        bi += 1; dec = null; pos = 0
        if (bi >= blocks.length) { curDoc = Long.MaxValue; return }
        dec = Blocks.decode(blocks(bi))
      }
      curDoc = dec.docs(pos)
      if (curDoc >= hi) curDoc = Long.MaxValue
    }

    /** Exact contribution at the current position. */
    def score(): Double = idf * Bm25.tfNorm(dec.tfs(pos), dec.dls(pos).toLong, avgdl)

    /** Shallow block info for target doc d: (blockUB, blockLast) of the first
      * not-yet-passed block with last_doc >= d; (0, MaxValue) when exhausted.
      * Never decodes.
      */
    def blockInfoFor(d: Long): (Double, Long) = {
      var i = bi
      while (i < blocks.length && blocks(i).last_doc < d) i += 1
      if (i >= blocks.length) (0.0, Long.MaxValue)
      else (boundOf(blocks(i)), blocks(i).last_doc)
    }
  }

  /** Bounded top-k heap ordered worst-first: lowest score, then largest doc
    * (so the peek is exactly the element the next candidate must beat under
    * (score DESC, doc_id ASC)).
    */
  private final class KHeap(k: Int) {
    private val pq = new java.util.PriorityQueue[Hit](k.max(1),
      (a: Hit, b: Hit) => {
        val c = java.lang.Double.compare(a.score, b.score)
        if (c != 0) c else java.lang.Long.compare(b.doc_id, a.doc_id)
      })
    def full: Boolean = pq.size() >= k
    def theta: Double = if (full) pq.peek().score else Double.NegativeInfinity
    def offer(doc: Long, score: Double): Unit = {
      if (!full) pq.add(Hit(doc, score))
      else {
        val w = pq.peek()
        if (score > w.score || (score == w.score && doc < w.doc_id)) {
          pq.poll(); pq.add(Hit(doc, score))
        }
      }
    }
    def drain(): ArrayBuffer[Hit] = {
      val out = new ArrayBuffer[Hit](pq.size())
      while (!pq.isEmpty) out += pq.poll()
      out
    }
  }

  /** Insertion sort by curDoc over the first n slots — the classic WAND
    * order repair: cursors only move forward, so the array is nearly sorted
    * each round and repair is O(T) typical, allocation-free (the previous
    * sortBy allocated a fresh buffer + boxed comparisons every pivot loop).
    */
  private def repairOrder(a: Array[TermCursor], n: Int): Unit = {
    var i = 1
    while (i < n) {
      val x = a(i)
      val d = x.curDoc
      var j = i - 1
      while (j >= 0 && a(j).curDoc > d) { a(j + 1) = a(j); j -= 1 }
      a(j + 1) = x
      i += 1
    }
  }

  /** Score one shard; returns its local top-k (unordered). `cursors` must be
    * in sorted-term order (fixed summation order).
    *
    * `minMatch` (ES minimum_should_match; = #terms is `match operator=and`):
    * only docs matched by ≥ minMatch of this shard's cursors qualify. WAND
    * stays rank-safe with two extra prunes:
    *   - pivot index is raised to at least minMatch−1: cursors are sorted by
    *     curDoc, so any doc d < arr(minMatch−1).curDoc has < minMatch cursors
    *     with curDoc ≤ d and can never reach minMatch matches — skipping it
    *     is exact, independent of θ;
    *   - a shard whose live-cursor count drops below minMatch is done.
    * The θ-based block-max skip is unchanged (mm only shrinks the candidate
    * set, never grows it).
    *
    * `after` (ES search_after keyset pagination): only docs STRICTLY after
    * the cursor under (score DESC, doc_id ASC) — score < afterScore, or
    * score == afterScore and doc_id > afterDoc — may enter the heap. This is
    * an exact filter applied at evaluation (an upper-bound test cannot
    * exclude docs ABOVE a score), so every skip decision stays θ-driven and
    * rank-safe; pages are O(k) regardless of depth, unlike from/size.
    *
    * `required` (ES bool filter context): cursors flagged required are
    * non-scoring conjuncts (their idf is 0, so their UB and contribution
    * are 0) that a doc MUST match to qualify. Each round every cursor is
    * first aligned to the max required curDoc — no qualifying doc exists
    * below it (a required posting list has no earlier docs left), so the
    * seek is exact, and evaluation then only ever fires with all required
    * cursors on the pivot. A required cursor exhausting ends the shard.
    * Required matches do NOT count toward `minMatch` (mm is a predicate on
    * the scored should-clauses, as in ES).
    *
    * `deleted` (Lucene live-docs): a sorted tombstone array for THIS shard's
    * docID range; tombstoned docs are rejected at evaluation (exact filter,
    * like `after`), never by a bound — rank-safe, and scoring stats stay
    * those of the full index until [[graft.index.Deletes.purge]], as in ES.
    *
    * `allowed` (ES bool `filter: {range: …}` context): a sorted allowed-doc
    * array for THIS shard's docID range, derived from a range-pruned
    * metadata scan; docs OUTSIDE it are rejected at evaluation — the exact
    * mirror of `deleted`, so every θ-driven skip stays rank-safe, and (as
    * with every ES filter context) scoring stats never move. null = no
    * range filter.
    */
  def scoreShard(cursors: Array[TermCursor], lo: Long, k: Int,
      minMatch: Int = 1,
      afterScore: Double = Double.PositiveInfinity,
      afterDoc: Long = -1L,
      required: Array[Boolean] = null,
      deleted: Array[Long] = null,
      allowed: Array[Long] = null): Seq[Hit] = {
    if (required != null) {
      var i = 0
      while (i < cursors.length) { cursors(i).required = required(i); i += 1 }
    }
    val scoringCount = cursors.count(!_.required)
    if (k <= 0 || cursors.isEmpty || scoringCount < minMatch) return Nil
    val reqCursors: Array[TermCursor] = cursors.filter(_.required)
    val heap = new KHeap(k)
    var i = 0
    while (i < cursors.length) { cursors(i).seek(lo); i += 1 }

    // live cursors maintained in curDoc order across rounds
    val arr = new Array[TermCursor](cursors.length)
    var n = 0
    var done = false
    while (!done) {
      // drop exhausted, repair order (compact in place from the full set on
      // the first round, from the previous round's survivors after)
      if (n == 0) {
        var j = 0
        while (j < cursors.length) {
          if (!cursors(j).exhausted) { arr(n) = cursors(j); n += 1 }
          j += 1
        }
      } else {
        var w = 0
        var r = 0
        while (r < n) {
          if (!arr(r).exhausted) { arr(w) = arr(r); w += 1 }
          r += 1
        }
        n = w
      }
      repairOrder(arr, n)
      // a required cursor exhausting means no filter-matching docs remain
      var reqDead = false
      var liveScoring = 0
      var reqMax = -1L
      var ri = 0
      while (ri < reqCursors.length) {
        val c = reqCursors(ri)
        if (c.exhausted) reqDead = true
        else if (c.curDoc > reqMax) reqMax = c.curDoc
        ri += 1
      }
      ri = 0
      while (ri < n) { if (!arr(ri).required) liveScoring += 1; ri += 1 }
      var realigned = false
      if (!reqDead && reqMax >= 0) {
        // align every cursor to the required frontier: a qualifying doc must
        // appear in every required posting list, none of which has a doc
        // left below reqMax — exact skip, independent of θ
        ri = 0
        while (ri < n) {
          if (arr(ri).curDoc < reqMax) { arr(ri).seek(reqMax); realigned = true }
          ri += 1
        }
      }
      if (reqDead || liveScoring < minMatch) done = true
      else if (realigned) () // re-compact + re-sort, then retry this round
      else {
        val theta = heap.theta
        // pivot: first p with cumulative term UB >= theta
        var cum = 0.0
        var p = -1
        var s = 0
        while (p < 0 && s < n) {
          cum += arr(s).termUB
          if (cum >= theta) p = s
          s += 1
        }
        if (p < 0) done = true // total UB < theta: nothing left can qualify
        else {
          // mm-raise: no doc below arr(minMatch-1).curDoc can have >= mm
          // matches (sorted-by-curDoc argument above) — exact, not UB-based
          if (p < minMatch - 1) p = minMatch - 1
          val pivot = arr(p).curDoc
          // extend pivot over cursors sharing the same curDoc
          while (p + 1 < n && arr(p + 1).curDoc == pivot) p += 1
          // shallow block-max check over terms 0..p
          var bub = 0.0
          var minLast = Long.MaxValue
          var q = 0
          while (q <= p) {
            val (ub, last) = arr(q).blockInfoFor(pivot)
            bub += ub
            if (last < minLast) minLast = last
            q += 1
          }
          if (bub < theta) {
            // rank-safe skip: no doc in [pivot, minLast] (terms 0..p only)
            // can reach theta; jump past the tightest block boundary, capped
            // by the next pivot candidate beyond p.
            val nextCur = if (p + 1 < n) arr(p + 1).curDoc else Long.MaxValue
            val jump0 = if (minLast == Long.MaxValue) Long.MaxValue else minLast + 1
            val dNew = math.min(jump0, nextCur)
            var r = 0
            while (r <= p) { arr(r).seek(dNew); r += 1 }
          } else {
            var allAtPivot = true
            var r = 0
            while (r < p) { if (arr(r).curDoc != pivot) allAtPivot = false; r += 1 }
            if (allAtPivot) {
              // exact evaluation in original (sorted-term) cursor order;
              // the per-doc cursor-at-pivot count IS the distinct matched-
              // term count (runs are docID-disjoint, one cursor per term)
              var sc = 0.0
              var matched = 0
              var t = 0
              while (t < cursors.length) {
                if (cursors(t).curDoc == pivot) {
                  sc += cursors(t).score() // required cursors contribute 0 (idf 0)
                  if (!cursors(t).required) matched += 1
                }
                t += 1
              }
              // tombstone exclusion (Deletes): exact filter at evaluation,
              // like `after` — θ-driven skips are unaffected, so rank-safe
              if (matched >= minMatch &&
                  (deleted == null ||
                    java.util.Arrays.binarySearch(deleted, pivot) < 0) &&
                  (allowed == null ||
                    java.util.Arrays.binarySearch(allowed, pivot) >= 0) &&
                  (sc < afterScore || (sc == afterScore && pivot > afterDoc)))
                heap.offer(pivot, sc)
              t = 0
              while (t < cursors.length) {
                if (cursors(t).curDoc == pivot) cursors(t).next()
                t += 1
              }
            } else {
              // cursors 0..p-1 hold all docs < pivot and their UB sum < theta:
              // advancing them to pivot is rank-safe
              r = 0
              while (r < p) { arr(r).seek(pivot); r += 1 }
            }
          }
        }
      }
    }
    heap.drain().toSeq
  }
}
