package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Catalog

/** Similarity search over the embeddings table (Array[Float] column).
  *
  * - [[cosineTopK]]: exact brute-force cosine top-k — broadcast probe,
  *   one narrow scan, TakeOrderedAndProject. The baseline and the verifier
  *   for the approximate path. At 100 TB this is a full scan but perfectly
  *   parallel; still the right tool for one-off probes.
  * - [[annLshTopK]]: random-hyperplane LSH bucketing (deterministic
  *   md5-derived hyperplanes so the oracle can replay them): bucket on
  *   sign bits, search only the probe's bucket. The scale path — bucket
  *   cardinality ~ n/2^bits, and the bucketing is one narrow pass that can
  *   be precomputed and bucketed-by on disk.
  *
  * All float math is widened to double before multiplication, summed
  * left-to-right in array order — bit-identical to the DuckDB twin modulo
  * the final 1e-6 rounding.
  */
object Embeddings {

  private def dotExpr(a: String, b: String): String =
    s"aggregate(zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (acc, v) -> acc + v)"

  def cosineTopK(spark: SparkSession, sfDir: String, probeId: Long, k: Int): DataFrame = {
    import spark.implicits._
    val emb = Catalog.readTable(spark, sfDir, "embeddings").select($"vec_id", $"embedding")
    val probe = emb.filter($"vec_id" === probeId)
      .select($"embedding".as("pe"))
    emb.filter($"vec_id" =!= probeId)
      .join(broadcast(probe))
      .select($"vec_id",
        round(
          expr(dotExpr("embedding", "pe")) /
            (sqrt(expr(dotExpr("embedding", "embedding"))) * sqrt(expr(dotExpr("pe", "pe")))),
          6).as("cos_r6"))
      .orderBy($"cos_r6".desc, $"vec_id".asc)
      .limit(k)
  }

  /** Deterministic hyperplane weights: w(plane i, dim j) derived from two
    * md5 nibbles of "i_j" → integer 0..255 → centered to (v − 127.5)/128.
    */
  private def hyperplanes(spark: SparkSession, planes: Int, dims: Int): DataFrame = {
    import spark.implicits._
    spark.range(planes).toDF("i")
      .crossJoin(spark.range(dims).toDF("j"))
      .select($"i", $"j",
        expr("((instr('0123456789abcdef', substring(md5(concat(i, '_', j)), 1, 1)) - 1) * 16 + " +
          "(instr('0123456789abcdef', substring(md5(concat(i, '_', j)), 2, 1)) - 1) - 127.5) / 128.0")
          .as("w"))
  }

  /** LSH bucket id per vector: sign bits of `planes` hyperplane projections. */
  def lshBuckets(spark: SparkSession, sfDir: String, planes: Int = 8): DataFrame = {
    import spark.implicits._
    val emb = Catalog.readTable(spark, sfDir, "embeddings").select($"vec_id", $"embedding")
    val dims = emb.select(size($"embedding")).head().getInt(0)
    val hp = hyperplanes(spark, planes, dims)
    emb
      .select($"vec_id", posexplode($"embedding").as(Seq("j", "x")))
      .join(hp, Seq("j".stripMargin))
      .groupBy($"vec_id", $"i")
      .agg(sum($"w" * $"x".cast("double")).as("proj"))
      .groupBy($"vec_id")
      .agg(sum(when($"proj" >= 0,
        expr("shiftleft(CAST(1 AS BIGINT), CAST(i AS INT))")).otherwise(0L)).as("bucket"))
  }

  /** ANN: search only the probe's LSH bucket, exact cosine inside it. */
  def annLshTopK(spark: SparkSession, sfDir: String, probeId: Long, k: Int,
      planes: Int = 8): DataFrame = {
    import spark.implicits._
    val buckets = lshBuckets(spark, sfDir, planes)
    val emb = Catalog.readTable(spark, sfDir, "embeddings").select($"vec_id", $"embedding")
    val probeBucket = buckets.filter($"vec_id" === probeId).select($"bucket")
    val candIds = buckets.join(broadcast(probeBucket), "bucket")
      .filter($"vec_id" =!= probeId).select($"vec_id")
    val probe = emb.filter($"vec_id" === probeId).select($"embedding".as("pe"))
    emb.join(candIds, "vec_id")
      .join(broadcast(probe))
      .select($"vec_id",
        round(
          expr(dotExpr("embedding", "pe")) /
            (sqrt(expr(dotExpr("embedding", "embedding"))) * sqrt(expr(dotExpr("pe", "pe")))),
          6).as("cos_r6"))
      .orderBy($"cos_r6".desc, $"vec_id".asc)
      .limit(k)
  }
}
