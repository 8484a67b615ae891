package graft.ml

import org.apache.spark.ml.feature.{Word2Vec, Word2VecModel}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed word-embedding training — spark.ml Word2Vec (skip-gram
  * with hierarchical softmax; Mikolov et al. 2013, public literature)
  * over the corpus token stream. The upstream producer of the
  * `embeddings` surface this engine already serves (ANN indexes,
  * SemDeDup, MMR): train here, then feed the vector family. Extension
  * surface — the reference has no embedding training.
  *
  * Scale shape: spark.ml's Word2Vec distributes by partition-local
  * skip-gram updates with periodic global syncs (maxIter rounds over
  * numPartitions slices); vocabulary pruning via minCount bounds the
  * in-memory vector table. Training is stochastic-by-parallelism (like
  * every hogwild-style embedding trainer), so contracts pin SEMANTIC
  * structure (planted co-occurrence → cosine proximity), not bytes.
  */
object Embeddings {

  /** Train on whitespace tokens of `textCol`. */
  def word2vec(docs: DataFrame, textCol: String, vectorSize: Int = 32,
      minCount: Int = 2, maxIter: Int = 1, seed: Long = 42L): Word2VecModel =
    new Word2Vec()
      .setInputCol("_toks").setOutputCol("_vec")
      .setVectorSize(vectorSize).setMinCount(minCount)
      .setMaxIter(maxIter).setSeed(seed)
      .fit(docs.select(graft.core.Cols.wsTokens(col(textCol)).as("_toks")))

  /** Top-k nearest vocabulary neighbors for each of `words`, flattened
    * to (token, rank, synonym, similarity) — no array/vector columns.
    * Unknown words are skipped (findSynonyms throws on OOV).
    */
  def topSynonyms(model: Word2VecModel, words: Seq[String], k: Int): DataFrame = {
    require(words.nonEmpty && k > 0, "words must be non-empty and k positive")
    val vocab = model.getVectors.select("word")
      .collect().map(_.getString(0)).toSet
    val frames = words.filter(vocab.contains).map { w =>
      model.findSynonyms(w, k)
        .select(lit(w).as("token"),
          row_number().over(org.apache.spark.sql.expressions.Window
            .orderBy(col("similarity").desc, col("word").asc)).as("rank"),
          col("word").as("synonym"),
          col("similarity"))
    }
    require(frames.nonEmpty, s"none of $words is in the trained vocabulary")
    frames.reduce(_.unionByName(_))
  }
}
