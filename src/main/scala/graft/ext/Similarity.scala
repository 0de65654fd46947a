package graft.ext

import scala.util.Random
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k with the query side broadcast —
  * exact, O(|queries| x |corpus|), the right tool when |queries| is
  * small. Scale path: random-hyperplane LSH — bucket the corpus by
  * signature prefix, probe only matching buckets; sub-linear per query,
  * recall tunable via bits/tables.
  */
object Similarity {

  /** Exact brute-force top-k neighbors for each query vector.
    * The query set is broadcast, so the corpus never shuffles: one scan,
    * one narrow window per query group — this is the plan you want even
    * at 100 TB corpus size (queries x corpus dot products, no exchange
    * of the corpus). Excludes self-matches. Deterministic tie-break on
    * neighbor id. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int = 5,
      vecCol: String = "embedding", idCol: String = "vec_id",
      useCodegenCosine: Boolean = true): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val cos =
      if (useCodegenCosine) VectorFunctions.cosine(col("qv"), col("cv"))
      else VectorFunctions.cosineHof(col("qv"), col("cv"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    c.join(q, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), cos.as("cos"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select("query_id", "neighbor_id", "rk")
  }

  /** Deterministic random hyperplanes (seeded) as literal arrays. */
  private[ext] def hyperplanes(dim: Int, nBits: Int, seed: Long): Seq[Array[Double]] = {
    val rnd = new Random(seed)
    Seq.fill(nBits)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-random-projection signature: bit i = sign(v . plane_i). */
  private[ext] def signature(vec: Column, planes: Seq[Array[Double]]): Column = {
    val bits = planes.zipWithIndex.map { case (p, i) =>
      val planeLit = array(p.map(lit): _*)
      val dot = aggregate(
        zip_with(vec, planeLit, (x, w) => x.cast("double") * w),
        lit(0.0), (acc, v) => acc + v)
      when(dot >= 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** LSH-bucketed all-pairs near-dup: self-join within hyperplane
    * buckets across `nTables` tables, then exact-cosine verification.
    * Sub-quadratic: pairs only form inside buckets. */
  def lshNearDupPairs(df: DataFrame, threshold: Double, nBits: Int,
      nTables: Int, seed: Long, vecCol: String, idCol: String): DataFrame = {
    val dim = 64
    val tables = (0 until nTables).map { t =>
      val planes = hyperplanes(dim, nBits, seed + t)
      val sig = df.select(col(idCol), col(vecCol),
        lit(t).as("tbl"), signature(col(vecCol), planes).as("sig"))
      sig.as("x").join(sig.as("y"), Seq("tbl", "sig"))
        .filter(col(s"x.$idCol") < col(s"y.$idCol"))
        .select(col(s"x.$idCol").as("a_id"), col(s"y.$idCol").as("b_id"),
          col(s"x.$vecCol").as("va"), col(s"y.$vecCol").as("vb"))
    }
    tables.reduce(_ unionByName _)
      .select(col("a_id"), col("b_id"),
        VectorFunctions.cosineHof(col("va"), col("vb")).as("cos"))
      .distinct()
      .filter(col("cos") >= threshold)
      .select("a_id", "b_id")
  }

  /** LSH-bucketed ANN: corpus and queries are hashed with the same
    * seeded hyperplanes into `nBits`-bit signatures over `nTables`
    * independent tables; candidates = corpus rows sharing a bucket in
    * ANY table; candidates are re-ranked with exact cosine.
    *
    * The bucket join shuffles (table, signature) keys — each query
    * touches ~corpus/2^nBits rows per table instead of the full corpus.
    * Recall rises with nTables, cost with nTables/2^-nBits. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int = 5,
      nBits: Int = 8, nTables: Int = 4, seed: Long = 42L,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val dim = 64
    val tables = (0 until nTables).map { t =>
      val planes = hyperplanes(dim, nBits, seed + t)
      val cSig = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
        lit(t).as("tbl"), signature(col(vecCol), planes).as("sig"))
      val qSig = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
        lit(t).as("tbl"), signature(col(vecCol), planes).as("sig"))
      cSig.join(broadcast(qSig), Seq("tbl", "sig"))
        .filter(col("query_id") =!= col("neighbor_id"))
        .select("query_id", "qv", "neighbor_id", "cv")
    }
    val cands = tables.reduce(_ unionByName _).distinct()
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    cands
      .select(col("query_id"), col("neighbor_id"),
        VectorFunctions.cosineHof(col("qv"), col("cv")).as("cos"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select("query_id", "neighbor_id", "rk")
  }
}
