package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Distributed training of simple linear filters over integer document
  * features — the "train your own quality classifier" step of a curation
  * pipeline (Dolma/FineWeb-class pipelines train lightweight linear
  * models over handcrafted features and then gate the corpus on the
  * scores; [[TextAnalysis.keywordScore]] is the inference half of that
  * story, this is the training half).
  *
  * The trainer is a DETERMINISTIC batch perceptron in pure integer
  * arithmetic: labels are ±1, features are integer counts, and each
  * iteration applies the summed update of every misclassified row
  * (margin ≤ 0 counts as misclassified, so iteration 1 from the zero
  * model updates on the whole batch):
  *
  *   w ← w + Σ_{y·(w·x+b) ≤ 0} y·x,   b ← b + Σ_{…} y
  *
  * All sums are exact BIGINT — associative and partition-order-free —
  * so the trained model is bit-identical across engines, cluster
  * layouts, and reruns, and an unrolled-CTE SQL oracle can reproduce
  * the whole trajectory (the q118/q133 discipline). The batch update
  * (summing all misclassified rows per pass, not the sequential online
  * rule) is what makes distributed determinism possible: the classic
  * row-at-a-time perceptron is order-dependent by construction.
  *
  * Scale shape: one aggregation job over the persisted feature table
  * per iteration (map-side partial sums of k+1 longs); the model lives
  * as driver literals between iterations (the Lloyd-trainer pattern)
  * and the whole trained model is memoized per (input plan, features,
  * iters), so scoring and warm re-runs pay zero training jobs. Integer
  * envelope: |w|·max|x|·k must stay under 2⁶³ — weights grow at most
  * by Σ|x| per pass, so ~10⁸-row corpora with ~10³-scale features hold
  * comfortably at small iteration counts; rescale features first past
  * that. */
object Learn {

  /** Trained linear model: integer weights (one per feature) + bias. */
  final case class LinearModel(weights: Array[Long], bias: Long)

  private def memoKey(df: DataFrame, tag: String, params: Any*): DataFrame =
    df.withColumn("__graft_memo", lit((tag +: params).mkString(":")))

  private def marginOf(w: Array[Long], b: Long, features: Seq[String]): Column =
    features.zipWithIndex.map { case (f, i) => lit(w(i)) * col(f) }
      .reduce(_ + _) + lit(b)

  /** Train `iters` full-batch perceptron passes over integer feature
    * columns; `labelCol` must hold ±1. Rows with a null label or any
    * null feature are dropped (a null count is absence of evidence, not
    * a zero). */
  def perceptronTrain(rows: DataFrame, labelCol: String,
      features: Seq[String], iters: Int): LinearModel = {
    require(iters >= 1, s"iters must be positive: $iters")
    require(features.nonEmpty, "need at least one feature column")
    val base = graft.core.Caches.persist(
      graft.core.Tables.spread(rows)
        .select(col(labelCol).cast(LongType).as("__y") +:
          features.map(f => col(f).cast(LongType).as(f)): _*)
        .filter(col("__y").isin(1L, -1L) &&
          features.map(f => col(f).isNotNull).reduce(_ && _)))
    graft.core.Caches.memo(
        memoKey(base, "perceptron", features.mkString(","), iters),
        "perceptronModel") {
      val w = Array.fill(features.length)(0L)
      var b = 0L
      for (_ <- 1 to iters) {
        val mis = col("__y") * marginOf(w, b, features) <= 0L
        val upd = features.map(f =>
          sum(when(mis, col("__y") * col(f)).otherwise(lit(0L)))) :+
          sum(when(mis, col("__y")).otherwise(lit(0L)))
        val r = base.agg(upd.head, upd.tail: _*).head
        for (i <- features.indices)
          if (!r.isNullAt(i)) w(i) += r.getLong(i)
        if (!r.isNullAt(features.length)) b += r.getLong(features.length)
      }
      LinearModel(w, b)
    }
  }

  /** Map-only scoring with a trained model: adds BIGINT `margin` and
    * ±1 `pred` (margin > 0 ⇒ +1 — the training rule's decision side).
    * A projection: no shuffle, streaming-safe, linear at any scale. */
  def perceptronScore(rows: DataFrame, model: LinearModel,
      features: Seq[String]): DataFrame = {
    require(model.weights.length == features.length,
      s"${model.weights.length} weights for ${features.length} features")
    rows
      .withColumn("margin", marginOf(model.weights, model.bias, features))
      .withColumn("pred",
        when(col("margin") > 0L, lit(1L)).otherwise(lit(-1L)))
  }

  /** Text-derivable feature registry — the features a YAML `linear_gate`
    * can compute from a pipeline's `text` payload at serve time. A model
    * trained on registry names is servable without Scala; training on
    * arbitrary columns remains the library path. Each is an integer,
    * engine-portable count (the q143 feature set). */
  val TextFeatures: Map[String, Column] = Map(
    "n_chars" -> length(col("text")).cast(LongType),
    "n_tokens" -> size(split(col("text"), " ", -1)).cast(LongType),
    "n_periods" -> (length(col("text")) -
      length(translate(col("text"), ".", ""))).cast(LongType))

  /** Persist a trained model as a tiny parquet dump — the
    * trainer→server handoff ([[graft.ext.Similarity.kmeansModelSave]]
    * precedent): one row per feature in weight order plus the bias row
    * (feature = "__bias"). Round-trips bit-exactly. */
  def linearModelSave(spark: org.apache.spark.sql.SparkSession,
      model: LinearModel, features: Seq[String], path: String): Unit = {
    import spark.implicits._
    val rows = features.zip(model.weights.toSeq)
      .zipWithIndex.map { case ((f, w), i) => (i, f, w) } :+
      ((features.length, "__bias", model.bias))
    rows.toDF("pos", "feature", "weight")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load a [[linearModelSave]] dump → (model, feature names in weight
    * order). */
  def linearModelLoad(spark: org.apache.spark.sql.SparkSession,
      path: String): (LinearModel, Seq[String]) = {
    val rows = spark.read.parquet(path)
      .select(col("pos"), col("feature"), col("weight"))
      .collect().sortBy(_.getInt(0))
    val (bias, feats) = rows.partition(_.getString(1) == "__bias")
    require(bias.length == 1, s"model at $path has ${bias.length} bias rows")
    (LinearModel(feats.map(_.getLong(2)), bias.head.getLong(2)),
      feats.map(_.getString(1)).toSeq)
  }
}
