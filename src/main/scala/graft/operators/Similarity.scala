package graft.operators

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor operators over an embedding column
  * (`array<float>`).
  *
  * Baseline: brute-force cosine top-k — a broadcast nested-loop of a
  * *small* query set against the (arbitrarily large, partitioned)
  * candidate set, then a per-query top-k window. Scale path: deterministic
  * random-hyperplane sign buckets (8 md5-seeded planes); bucketing is a
  * narrow map, and candidate generation becomes a hash join on bucket ids
  * so the 100 TB plan never materializes an all-pairs product.
  */
object Similarity {

  /** Cast a float array column to double for exact, engine-portable
    * arithmetic (float→double is lossless).
    */
  def asDouble(vec: Column): Column = transform(vec, x => x.cast("double"))

  def l2norm(vecD: Column): Column =
    sqrt(aggregate(vecD, lit(0.0d), (acc, x) => acc + x * x))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  /** Brute-force cosine top-k of each query vector (small set, broadcast)
    * against all candidates. Output: (query_id, neighbor_id, rank).
    */
  def bruteForceTopK(
      emb: DataFrame, id: String, vec: String,
      queryFilter: Column, k: Int): DataFrame = {
    val e = emb.select(col(id).as("_id"), asDouble(col(vec)).as("_v"))
      .withColumn("_norm", l2norm(col("_v")))
    val q = e.where(queryFilter.as("_qf"))
      .select(col("_id").as("query_id"), col("_v").as("_qv"),
        col("_norm").as("_qn"))
    val cand = e.select(col("_id").as("neighbor_id"), col("_v").as("_cv"),
      col("_norm").as("_cn"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("_cos").desc, col("neighbor_id"))
    broadcast(q).join(cand, col("query_id") =!= col("neighbor_id"))
      .withColumn("_cos", dot(col("_qv"), col("_cv")) / (col("_qn") * col("_cn")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank")
  }

  /** Deterministic random-hyperplane directions: plane `p`, dimension `j`
    * takes -1.0 or +1.0 from hex digit `j mod 32` of
    * md5("plane#p#{j/32}"). Reproducible in any engine with md5.
    */
  def planeDirections(nPlanes: Int, dims: Int): Seq[Seq[Double]] = {
    def md5hex(s: String): String =
      MessageDigest.getInstance("MD5")
        .digest(s.getBytes(StandardCharsets.UTF_8))
        .map("%02x".format(_)).mkString
    (0 until nPlanes).map { p =>
      val hex = (0 to (dims - 1) / 32).map(c => md5hex(s"plane#$p#$c")).mkString
      (0 until dims).map { j =>
        val d = Integer.parseInt(hex.substring(j, j + 1), 16)
        if (d < 8) -1.0 else 1.0
      }
    }
  }

  /** Sign-LSH bucket id (a string of nPlanes 0/1 chars) per vector. */
  def signBuckets(
      emb: DataFrame, id: String, vec: String,
      nPlanes: Int, dims: Int): DataFrame = {
    val dirs = planeDirections(nPlanes, dims)
    val vd = asDouble(col(vec))
    val bits = (0 until nPlanes).map { p =>
      when(dot(vd, typedlit(dirs(p))) > 0, "1").otherwise("0")
    }
    emb.select(col(id).as("vec_id"), concat(bits: _*).as("bucket"))
  }
}
