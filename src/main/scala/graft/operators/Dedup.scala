package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.core.Analyzer
import graft.io.Catalog

/** Deduplication operators for large-scale training-data pipelines:
  * exact (hash groupBy), n-gram Jaccard, MinHash+LSH, SimHash.
  *
  * Everything is pure Column DSL (whole-stage codegen) and engine-portable:
  * hashes are md5 hex strings (string min = lexicographic in both Spark and
  * DuckDB) or exact integer arithmetic, so every operator has a DuckDB
  * oracle twin that matches bit-for-bit.
  *
  * Scale notes (100 TB corpus): exact dedup is one hash-shuffle; shingle
  * self-joins are bounded by LSH banding (candidates ≈ Σ J², not n²);
  * the pairwise verify joins only candidate pairs. SimHash is a narrow
  * per-doc map + 32-way explode, no pairwise stage.
  */
object Dedup {

  // Shingles are token TRIGRAMS (not bigrams): the shingle space must be
  // large enough that unrelated docs rarely co-occur — with the test
  // corpus's 31-term vocabulary, bigram shingles made nearly every doc
  // pair a candidate. Per-doc shingle sets are built in
  // [[shingleArraysTyped]] (typed tight loop; the old Column-DSL
  // transform/array_distinct/explode chain was interpreted per element).

  /** Exact duplicate groups by content hash (keep-lowest-docID canonical). */
  def exactDups(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Catalog.readTable(spark, sfDir, "documents")
      .groupBy(md5($"text".cast("binary")).as("text_md5"))
      .agg(count(lit(1)).as("n_docs"), min($"doc_id").as("canonical_doc"))
      .filter($"n_docs" > 1)
      .orderBy($"text_md5")
  }

  /** Exact-Jaccard verification of candidate pairs only, against the
    * per-doc shingle ARRAYS: i = |A ∩ B| and the sizes come from one
    * `array_intersect`/`size` projection per candidate pair instead of the
    * r6 shape's two shingle-keyed joins over the re-exploded corpus
    * (guide §2.3: only candidate docs' arrays cross the joins, never
    * per-shingle rows; both arrays are distinct by construction).
    */
  private def verifyPairsArrays(arrays: DataFrame, cand: DataFrame,
      tau: Double): DataFrame = {
    import arrays.sparkSession.implicits._
    cand
      .join(arrays.select($"doc_id".as("doc_a"), $"sh".as("sha")), "doc_a")
      .join(arrays.select($"doc_id".as("doc_b"), $"sh".as("shb")), "doc_b")
      .select($"doc_a", $"doc_b",
        size(array_intersect($"sha", $"shb")).cast("long").as("i"),
        size($"sha").cast("long").as("na"), size($"shb").cast("long").as("nb"))
      .select($"doc_a", $"doc_b",
        round($"i" * lit(1.0) / ($"na" + $"nb" - $"i"), 6).as("jaccard_r6"))
      .filter($"jaccard_r6" >= tau)
      .orderBy($"doc_a", $"doc_b")
  }

  /** Near-duplicate pairs by token-trigram Jaccard ≥ tau — exact all-pairs:
    * shared-shingle counts via shingle equi-join (output bounded by real
    * co-occurrence, which the trigram space keeps sparse), then the Jaccard
    * filter. (A PPJoin prefix filter was tried and measured SLOWER here:
    * with a small vocabulary, rare-first prefixes prune almost nothing and
    * the extra windows/joins dominate. The MinHash+LSH variant below is the
    * scale path regardless.)
    *
    * Scale guard: shingles with document frequency > `maxShingleDf` are
    * dropped BEFORE the self-join (standard head-shingle cap — a single
    * boilerplate shingle shared by f docs alone produces f·(f−1)/2 join
    * rows, quadratic in f). Jaccard is then computed consistently over the
    * capped shingle sets on both sides (numerator and denominator), which
    * is the documented recall trade: pairs whose only overlap is boilerplate
    * no longer surface. The DuckDB oracle applies the identical cap. On the
    * test corpora max shingle df (25 at sf0.1) is far below the default cap,
    * so results are unchanged there; the cap semantics are pinned by
    * DedupSpec with a synthetic hot-shingle corpus.
    */
  def ngramJaccardPairs(spark: SparkSession, sfDir: String, tau: Double,
      maxShingleDf: Long = 1000L): DataFrame = {
    import spark.implicits._
    // ONE shuffle of the shingle table, total (r7; guide §2.3/§2.4 — the r6
    // shape computed the exploded shingle table five times: a df pass for
    // the hot set, an anti-join, a size agg, and BOTH sides of a
    // shingle-keyed self-join). Per shingle, one bounded aggregation yields
    // (sdf, up to cap+1 carrying docs): shingles over the cap are dropped
    // with their doc lists never fully materialized (state stays O(cap) even
    // for boilerplate shared by millions of docs — the same constant-state
    // contract as substringDups' TwoMinDistinctAgg); capped shingles emit
    // their doc pairs directly (equivalent to the old self-join restricted
    // to capped shingles, which is exactly what the anti-join enforced).
    // Per-doc sizes come from the same aggregation's exchange (reused), so
    // numerator and denominator stay consistently capped — semantics and
    // oracle unchanged.
    val keep = math.min(maxShingleDf + 1, Int.MaxValue.toLong).toInt
    // relational groupBy over the udaf-wrapped aggregator (the
    // substringDups conversion): the column group key skips groupByKey's
    // per-row tuple deserialization and keyBy closure
    val st = shingleArraysTyped(spark, sfDir)
      .select(explode($"sh").as("s"), $"doc_id")
      .groupBy($"s")
      .agg(udaf(new DocsCapAgg(keep)).apply($"doc_id").as("cd"))
    val capped = st.filter($"cd._1" <= maxShingleDf)
      .select($"cd._2").as[Seq[Long]]
    val inter = capped
      .flatMap { docs =>
        for {
          i <- docs.indices.iterator
          j <- (i + 1 until docs.length).iterator
        } yield (docs(i), docs(j))
      }
      .toDF("doc_a", "doc_b")
      .groupBy($"doc_a", $"doc_b")
      .agg(count(lit(1)).as("i"))
    val sz = capped.flatMap(_.iterator).toDF("doc_id")
      .groupBy($"doc_id").agg(count(lit(1)).as("n"))
    inter
      .join(sz.select($"doc_id".as("doc_a"), $"n".as("na")), "doc_a")
      .join(sz.select($"doc_id".as("doc_b"), $"n".as("nb")), "doc_b")
      .select($"doc_a", $"doc_b",
        round($"i" * lit(1.0) / ($"na" + $"nb" - $"i"), 6).as("jaccard_r6"))
      .filter($"jaccard_r6" >= tau)
      .orderBy($"doc_a", $"doc_b")
  }

  /** Per-shingle (df, carrying docs capped at `keep`) in one pass — the
    * [[ngramJaccardPairs]] aggregator. The doc list stops growing at `keep`
    * entries (callers drop shingles with df over the cap, so a complete
    * list only matters at or under it); the count is always exact. State is
    * O(keep) regardless of how many docs share the shingle; mergeable in
    * any order, so Spark runs it with map-side partials. The finished list
    * is sorted for deterministic pair emission.
    */
  private final class DocsCapAgg(keep: Int)
      extends org.apache.spark.sql.expressions.Aggregator[
        Long, (Long, List[Long]), (Long, Seq[Long])] {
    override def zero: (Long, List[Long]) = (0L, Nil)
    override def reduce(b: (Long, List[Long]), in: Long): (Long, List[Long]) =
      (b._1 + 1, if (b._1 < keep) in :: b._2 else b._2)
    override def merge(a: (Long, List[Long]), b: (Long, List[Long])): (Long, List[Long]) =
      (a._1 + b._1, (a._2 ++ b._2).take(keep))
    override def finish(r: (Long, List[Long])): (Long, Seq[Long]) =
      (r._1, r._2.sorted)
    override def bufferEncoder =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Long, List[Long])]()
    override def outputEncoder =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Long, Seq[Long])]()
  }

  /** MinHash + LSH near-dup detection: `numHashes` md5-seeded minhashes
    * (string-min — exact, portable), banded `rows`-per-band bucket keys,
    * bucket-join candidate pairs, exact Jaccard verification ≥ tau.
    */
  private def hexOf(b: Array[Byte]): String = {
    val hx = "0123456789abcdef"
    val sb = new java.lang.StringBuilder(b.length * 2)
    var i = 0
    while (i < b.length) {
      sb.append(hx.charAt((b(i) >> 4) & 0xf)); sb.append(hx.charAt(b(i) & 0xf))
      i += 1
    }
    sb.toString
  }

  private def ensureParallelism(df: DataFrame): DataFrame =
    Catalog.ensureParallelism(df)

  def minhashLshPairs(spark: SparkSession, sfDir: String, tau: Double,
      numHashes: Int = 8, rowsPerBand: Int = 2): DataFrame = {
    import spark.implicits._
    // ONE narrow typed pass per doc: tokenize → trigram shingles → per-hash
    // min of md5("h:" + s) → band keys (r7; guide §2.3/§2.4 + §4). The r6
    // shape exploded every (shingle × hash) pair and shuffled them through
    // groupBy(doc_id, h) plus a second groupBy(doc_id, band) pivot — five
    // corpus tokenizations overall; an intermediate array_min(transform(…))
    // rewrite measured ~7 µs/element: array HOFs are NOT whole-stage-
    // codegen'd (the embCosinePairs lesson), so the hash loop runs as JVM
    // code on MessageDigest instead. Identical strings hash to identical
    // hex (same md5, same lexicographic min — ASCII hex compares byte-wise
    // in both engines), so signatures, candidates and the oracle are
    // unchanged. Duplicate shingles cannot change a min, so the distinct
    // step is skipped here (verification sizes use the distinct arrays).
    // The tiny band table (nBands rows/doc) is cut with localCheckpoint so
    // the self-join's two sides read it instead of re-running the pass.
    val nBands = (numHashes + rowsPerBand - 1) / rowsPerBand
    val docs = Catalog.readTable(spark, sfDir, "documents")
      .select($"doc_id", $"text")
    val bands = ensureParallelism(docs).as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { case (id, text) =>
          val t = Analyzer.tokenize(text).toArray
          if (t.length < 3) Iterator.empty
          else {
            val mins = new Array[String](numHashes)
            var i = 0
            while (i < t.length - 2) {
              val s = t(i) + "_" + t(i + 1) + "_" + t(i + 2)
              var h = 0
              while (h < numHashes) {
                val hex = hexOf(md.digest((h.toString + ":" + s).getBytes("UTF-8")))
                if (mins(h) == null || hex.compareTo(mins(h)) < 0) mins(h) = hex
                h += 1
              }
              i += 1
            }
            (0 until nBands).iterator.map { b =>
              val hi = math.min((b + 1) * rowsPerBand, numHashes)
              val slots = (b * rowsPerBand until hi).map(mins).mkString("|")
              (id, b, hexOf(md.digest(slots.getBytes("UTF-8"))))
            }
          }
        }
      }
      .toDF("doc_id", "band", "bk")
      .localCheckpoint()

    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bk") === col("y.bk") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()

    // exact verification restricted to the candidate pairs
    verifyPairsArrays(shingleArraysTyped(spark, sfDir), cand, tau)
  }

  /** (doc_id, distinct trigram shingle array) as a typed tight loop — the
    * shingleArrays twin for heavy consumers (the Column-DSL transform/
    * array_distinct chain is interpreted per element; this is the codegen-
    * free-but-JVM-speed form). Insertion order of the distinct set is
    * irrelevant to every consumer (intersection/size math).
    */
  private def shingleArraysTyped(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    ensureParallelism(Catalog.readTable(spark, sfDir, "documents")
      .select($"doc_id", $"text")).as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val t = Analyzer.tokenize(text).toArray
          val set = new java.util.LinkedHashSet[String]()
          var i = 0
          while (i < t.length - 2) {
            set.add(t(i) + "_" + t(i + 1) + "_" + t(i + 2))
            i += 1
          }
          val arr = new Array[String](set.size)
          set.toArray(arr)
          (id, arr.toSeq)
        }
      }
      .toDF("doc_id", "sh")
  }

  /** Connected components over near-dup pairs → keep/drop decisions: the
    * operator a training-data pipeline actually runs. Input: undirected
    * edges (doc_a, doc_b). Output: one row per doc that appears in ≥1 pair —
    * (doc_id, canonical_id = min docID reachable, cluster_size). The
    * canonical doc is the cluster's keeper; everything else is a drop.
    *
    * Algorithm: iterative min-label propagation (label(v) ← min(label(v),
    * min over neighbors)) to convergence — pure DataFrame joins/aggs, one
    * shuffle pair per round, O(cluster diameter) rounds. Near-dup clusters
    * are short chains in practice (diameter ≤ a few hops), so rounds stay
    * small even at 10^9 docs; for adversarial long-chain graphs the
    * large-star/small-star variant (Kiveris et al., SoCC 2014) halves the
    * diameter per round — not needed for dedup graphs.
    *
    * Each round's labels are materialized to parquet and read back — a
    * lineage cut per round (without it the logical plan deepens every
    * iteration until analysis/printing blows the stack — the standard
    * iterative-DataFrame trap, same reason GraphX checkpoints), and it
    * leaves zero persisted blocks behind. The converged labels land at
    * `outPath` (the production shape — dedup decisions are a pipeline
    * artifact, not a transient); intermediate rounds are deleted.
    */
  def connectedComponents(pairs: DataFrame, outPath: String): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    // durableRounds=true restores the r6 per-round parquet write+read —
    // set it on a cluster where a mid-iteration executor loss must not
    // restart the whole clustering. The default round cut is
    // localCheckpoint (eager): same lineage truncation, ONE job per round
    // and no per-round FS round-trip, listing or cleanup (guide §5 —
    // "localCheckpoint() is a cheaper way to cut lineage when fault
    // tolerance of that intermediate is not critical"; a lost block here
    // fails the query, never corrupts it, and the converged labels still
    // publish durably to outPath below).
    val durableRounds = spark.conf
      .getOption("spark.graft.cc.durableRounds").exists(_.toBoolean)
    val edges = pairs
      .select($"doc_a".cast("long").as("u"), $"doc_b".cast("long").as("v"))
      .union(pairs.select($"doc_b".cast("long").as("u"), $"doc_a".cast("long").as("v")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)

    def roundPath(r: Int) = s"$outPath-round$r"
    // each localCheckpoint round unpersists its predecessor once it is
    // materialized (the predecessor's blocks are dead the moment the next
    // round exists), and dropLastCut() below releases the final round after
    // the durable publish — the operator's no-persisted-blocks contract
    // (DedupSpec) holds exactly as it did for the parquet rounds
    var lastCut: Option[org.apache.spark.rdd.RDD[_]] = None
    def dropLastCut(): Unit = {
      lastCut.foreach(_.unpersist(blocking = false))
      lastCut = None
    }
    def cut(df: DataFrame, r: Int): DataFrame =
      if (durableRounds) {
        df.write.mode(SaveMode.Overwrite).parquet(roundPath(r))
        spark.read.parquet(roundPath(r))
      } else {
        val out = df.localCheckpoint()
        val cp = out.queryExecution.analyzed.collect {
          case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
        }.headOption
        dropLastCut()
        lastCut = cp
        out
      }

    var round = 0
    var labels = cut(edges.select($"u".as("doc_id")).distinct()
      .select($"doc_id", $"doc_id".as("label")), 0)
    var converged = labels.isEmpty // empty dup graph: no rounds
    while (!converged) {
      val neigh = edges
        .join(labels.select($"doc_id".as("u"), $"label"), "u")
        .groupBy($"v".as("doc_id")).agg(min($"label").as("nl"))
      round += 1
      // convergence detected INSIDE the round's own materialization job:
      // the new label is least(old, neighbor-min), so "changed" is visible
      // row-locally — an accumulator counts it during the checkpoint/write
      // instead of a separate read-back + join + count (2 extra
      // jobs/round, VERDICT r2). Accumulator one-sidedness is safe here: a
      // retried task can only over-count (→ one harmless extra round),
      // never report 0 changes when a successful task changed a label.
      val changedAcc = spark.sparkContext.longAccumulator(s"cc_changed_r$round")
      labels = cut(labels.join(neigh, Seq("doc_id"), "left")
        .select($"doc_id", $"label",
          least($"label", coalesce($"nl", $"label")).as("nl2"))
        .as[(Long, Long, Long)]
        .map { r => if (r._3 != r._2) changedAcc.add(1L); (r._1, r._3) }
        .toDF("doc_id", "label"), round)
      converged = changedAcc.value == 0L
    }
    edges.unpersist(blocking = false)
    labels.write.mode(SaveMode.Overwrite).parquet(outPath)
    dropLastCut()
    if (durableRounds) {
      // clean up round files (Hadoop FS — works on local/HDFS/S3 alike)
      val conf = spark.sparkContext.hadoopConfiguration
      (0 to round).foreach { r =>
        val p = new org.apache.hadoop.fs.Path(roundPath(r))
        p.getFileSystem(conf).delete(p, true)
      }
    }

    val lab = spark.read.parquet(outPath)
    val sizes = lab.groupBy($"label").agg(count(lit(1)).as("cluster_size"))
    lab.join(sizes, "label")
      .select($"doc_id", $"label".as("canonical_id"), $"cluster_size")
      .orderBy($"doc_id")
  }

  // per-JVM tag: two drivers (or parallel test JVMs) clustering the same
  // corpus never share round files — the round dirs are deleted mid-
  // iteration, so a shared path corrupts a concurrent run's labels
  private val jvmTag = java.util.UUID.randomUUID().toString.take(8)

  /** Driver-oracled canonicalization over the MinHash+LSH pairs. The label
    * table is a pipeline artifact; its root comes from `spark.graft.cc.root`
    * (set it to a durable shared filesystem on a cluster — node-local /tmp
    * is per-node and non-durable there), defaulting to the JVM temp dir
    * with a per-run unique tag.
    */
  def dedupClusters(spark: SparkSession, sfDir: String, tau: Double,
      outPath: Option[String] = None): DataFrame = {
    val root = outPath.getOrElse {
      val base = spark.conf.get("spark.graft.cc.root",
        s"${System.getProperty("java.io.tmpdir")}/graft-cc-$jvmTag")
      s"$base/${sfDir.replaceAll("[^A-Za-z0-9.]", "_")}/labels"
    }
    connectedComponents(minhashLshPairs(spark, sfDir, tau), root)
  }

  /** 32-bit SimHash fingerprint per doc: md5-derived term bit patterns
    * weighted by tf; pure integer arithmetic — bit-exact across engines.
    */
  /** SUBSTRING-level dedup (Lee et al. 2022, "Deduplicating Training Data
    * Makes Language Models Better"): the standard pipeline removes repeated
    * SPANS, not just whole near-duplicate documents — a ≥ `minTokens`-token
    * substring appearing in more than one document is a duplicated span in
    * every document carrying it. Output: one row per maximal duplicated
    * span, `(doc_id, start_tok, end_tok, dup_of)` (token positions
    * 0-based inclusive; `dup_of` = the lowest other doc sharing the span's
    * first shared shingle — the cluster-canonical convention exactDups and
    * dedupClusters use).
    *
    * The paper's suffix array is a single-machine structure; the
    * distributed equivalent here rides the winnowing machinery: token
    * `k`-gram shingle hashes with positions, a shingle is DUPLICATED when
    * ≥ 2 distinct docs carry it, and a duplicated substring of length L
    * is exactly a run of L−k+1 consecutive duplicated-shingle positions
    * (gaps-and-islands over each doc's position stream).
    *
    * Scale shape: one tokenize+posexplode pass; shingle stats are a
    * groupBy on the UNIFORM md5 key with map-side partials and
    * constant-size state (min, second-min, distinct-2 count — never a
    * per-hash doc list); the run detection is a per-doc window (partition
    * key = doc_id, bounded by doc length). No pairwise stage anywhere —
    * boilerplate shingles shared by millions of docs cost one posting row
    * each, not a quadratic join (the reason Lee et al. replaces MinHash
    * for span work).
    */
  def substringDups(spark: SparkSession, sfDir: String,
      minTokens: Int = 12, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    require(k >= 2 && minTokens >= k, "need k >= 2 and minTokens >= k")
    val gramExpr = (0 until k).map(j => s"t[i+$j]").mkString(", '_', ")
    val grams = ensureParallelism(Catalog.readTable(spark, sfDir, "documents"))
      .select($"doc_id", Analyzer.tokensCol($"text").as("t"))
      .select($"doc_id", posexplode(
        when(size($"t") >= k,
          expr(s"transform(sequence(0, size(t)-$k), i -> md5(concat($gramExpr)))"))
          .otherwise(expr("array()"))))
      .toDF("doc_id", "pos", "h")
      .select($"doc_id", $"pos".cast("long").as("pos"), $"h")
    // per-hash (m1, m2) = two lowest DISTINCT docs, in ONE constant-state
    // aggregation (two longs per key, partial-merged map-side — never a
    // per-hash doc list, and no second corpus pass for the second-min);
    // a hash is cross-doc duplicated iff m2 is set. r7: the aggregation is
    // a RELATIONAL groupBy($"h") over a udaf-wrapped Aggregator instead of
    // the old groupByKey(_._1) — identical merge logic, but the group key
    // is now the plain `h` column, so the aggregation's shuffle is the
    // same hashpartitioning(h) the occ join below needs and the exchange
    // is planned once for both consumers (the typed-key exchange could
    // never line up with the relational join's — guide §2.4).
    val dup = grams.groupBy($"h")
      .agg(udaf(new TwoMinDistinctAgg()).apply($"doc_id").as("mm"))
      .select($"h", $"mm._1".as("m1"), $"mm._2".as("m2"))
      .filter($"m2" =!= Long.MaxValue)
    val occ = grams.join(dup, "h")
      .select($"doc_id", $"pos",
        when($"doc_id" === $"m1", $"m2").otherwise($"m1").as("dup_src"))
    // gaps-and-islands: consecutive duplicated positions share pos − rn
    val w = Window.partitionBy($"doc_id").orderBy($"pos")
    occ.withColumn("grp", $"pos" - row_number().over(w))
      .groupBy($"doc_id", $"grp")
      .agg(min($"pos").as("start_tok"),
        (max($"pos") + lit(k - 1).cast("long")).as("end_tok"),
        min($"dup_src").as("dup_of"))
      .filter($"end_tok" - $"start_tok" + 1 >= minTokens)
      .select($"doc_id", $"start_tok", $"end_tok", $"dup_of")
      .orderBy($"doc_id", $"start_tok")
  }

  /** Two smallest DISTINCT values in one pass — the [[substringDups]]
    * shingle-stats aggregator. State = two longs regardless of how many
    * docs share the shingle (boilerplate shared by millions of docs still
    * costs 16 bytes of state), mergeable in any order, so Spark runs it as
    * a partial+final object hash aggregate. `Long.MaxValue` = unset.
    */
  private final class TwoMinDistinctAgg
      extends org.apache.spark.sql.expressions.Aggregator[
        Long, (Long, Long), (Long, Long)] {
    override def zero: (Long, Long) = (Long.MaxValue, Long.MaxValue)
    private def add(b: (Long, Long), d: Long): (Long, Long) =
      if (d == b._1 || d == b._2) b
      else if (d < b._1) (d, b._1)
      else if (d < b._2) (b._1, d)
      else b
    override def reduce(b: (Long, Long), in: Long): (Long, Long) =
      add(b, in)
    override def merge(a: (Long, Long), b: (Long, Long)): (Long, Long) = {
      val x = if (b._1 == Long.MaxValue) a else add(a, b._1)
      if (b._2 == Long.MaxValue) x else add(x, b._2)
    }
    override def finish(r: (Long, Long)): (Long, Long) = r
    override def bufferEncoder =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Long, Long)]()
    override def outputEncoder =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Long, Long)]()
  }

  def simhash(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // ONE exchange (r7; guide §2.3): each bit's signed tally is its own
    // aggregate column over the raw term occurrences — Σ_occurrences(±1)
    // ≡ Σ_terms tf·(±1), exact integer arithmetic either way, so the
    // fingerprints are bit-identical to the r6 shape (and the oracle),
    // which exploded 32 rows per (doc, term) through a tf pre-aggregation
    // plus a (doc, bit) aggregation — three exchanges and a 32× row blowup
    // for the same 32 sums.
    val contribCols = (0 until 32).map { b =>
      sum(expr(
        s"CAST((shiftright(instr('0123456789abcdef', substring(m, ${1 + b / 4}, 1)) - 1, ${3 - b % 4}) & 1) * 2 - 1 AS BIGINT)"))
        .as(s"s$b")
    }
    val packed = (0 until 32).map(b =>
      when(col(s"s$b") >= 0, lit(1L << (31 - b))).otherwise(lit(0L)))
      .reduce(_ + _)
    Catalog.readTable(spark, sfDir, "documents")
      .select($"doc_id", explode(Analyzer.tokensCol($"text")).as("term"))
      .select($"doc_id", md5($"term".cast("binary")).as("m"))
      .groupBy($"doc_id")
      .agg(contribCols.head, contribCols.tail: _*)
      .select($"doc_id", packed.cast("long").as("simhash"))
      .orderBy($"doc_id")
  }
}
