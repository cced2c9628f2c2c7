package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor over an embedding
  * column — the coarse-quantizer alternative to [[RandomHyperplaneLsh]]:
  * assign every vector to its nearest centroid cell, search only the
  * query's `nProbe` nearest cells.
  *
  * "Training" is deterministic and cheap: the centroids are the first
  * `nCells` corpus vectors (by id). On a real deployment this becomes a
  * k-means fit on a sample; the assignment/probe machinery — the part
  * that must scale — is identical.
  *
  * Scale posture: centroids are tiny and BROADCAST; assignment is one
  * narrow pass over the corpus (|corpus|·nCells fused-codegen cosines);
  * the search joins candidates by cell — a shuffle on cell id bounded by
  * nProbe/nCells of the corpus per query, never a full cross join.
  */
class IvfIndex(nCells: Int = 16, nProbe: Int = 4) extends Serializable {

  private def bestCells(df: DataFrame, vecCol: String, idCol: String,
                        centroids: DataFrame, keep: Int): DataFrame = {
    val scored = df.crossJoin(broadcast(centroids))
      .withColumn("__cs", VectorFunctions.cosine(col(vecCol), col("centroid")))
    val w = Window.partitionBy(col(idCol)).orderBy(col("__cs").desc, col("cell"))
    scored.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= keep)
      .drop("__cs", "__rn", "centroid")
  }

  def centroidsOf(corpus: DataFrame): DataFrame =
    corpus.where(col("vec_id") < nCells)
      .select(col("vec_id").cast("int").as("cell"), col("embedding").as("centroid"))

  /** Corpus vectors with their (single) nearest-centroid cell. */
  def assign(corpus: DataFrame): DataFrame =
    bestCells(corpus, "embedding", "vec_id", centroidsOf(corpus), keep = 1)

  /** Top-k neighbors per query, searched in the query's nProbe cells. */
  def annTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val cells = assign(corpus)
    val q = bestCells(
        queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb")),
        "q_emb", "query_id", centroidsOf(corpus), keep = nProbe)
    val scored = cells.join(q, Seq("cell"))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        VectorFunctions.cosine(col("q_emb"), col("embedding")).as("cos"))
      // the corpus side carries ONE cell per vector, but a query probes
      // nProbe cells — (query, neighbor) stays unique because the join
      // matches only the neighbor's single cell; dedupe anyway in case
      // nProbe ever exceeds 1 on the corpus side
      .dropDuplicates("query_id", "neighbor_id")
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }
}
