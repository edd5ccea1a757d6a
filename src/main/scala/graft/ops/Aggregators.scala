package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (SURVEY §2.11): the two custom aggregations the
  * reference hand-rolls in its profiling/embedding paths.
  */
object Aggregators {

  /** A15/T3: additive BOW merge — union of term-count maps
    * (profiling/extractors/TextExtractor.java:80-87 AVG-type merge).
    */
  class BowMerge extends Aggregator[Map[String, Long], Map[String, Long], Map[String, Long]] {
    def zero: Map[String, Long] = Map.empty
    def reduce(b: Map[String, Long], a: Map[String, Long]): Map[String, Long] = merge(b, a)
    def merge(b1: Map[String, Long], b2: Map[String, Long]): Map[String, Long] = {
      val (small, large) = if (b1.size < b2.size) (b1, b2) else (b2, b1)
      small.foldLeft(large) { case (acc, (k, v)) => acc.updated(k, acc.getOrElse(k, 0L) + v) }
    }
    def finish(r: Map[String, Long]): Map[String, Long] = r
    def bufferEncoder: Encoder[Map[String, Long]] = Encoders.kryo[Map[String, Long]]
    def outputEncoder: Encoder[Map[String, Long]] = implicitly(Encoders.kryo[Map[String, Long]])
  }

  /** J8: weighted average of embedding vectors — Σ wᵢ·vᵢ / Σ wᵢ
    * (scorer/embeddings/SocialGraphEmbeddings.java:38-44 semantics: a
    * user's embedding = weighted mean of its followees' vectors).
    */
  class WeightedVecAvg(dim: Int)
      extends Aggregator[(Seq[Double], Double), (Array[Double], Double), Seq[Double]] {
    def zero: (Array[Double], Double) = (new Array[Double](dim), 0.0)
    def reduce(b: (Array[Double], Double), a: (Seq[Double], Double)): (Array[Double], Double) = {
      val (acc, wsum) = b
      val (v, w) = a
      if (v != null) {
        var i = 0
        while (i < math.min(dim, v.length)) { acc(i) += v(i) * w; i += 1 }
        (acc, wsum + w)
      } else b
    }
    def merge(b1: (Array[Double], Double), b2: (Array[Double], Double)): (Array[Double], Double) = {
      var i = 0
      while (i < dim) { b1._1(i) += b2._1(i); i += 1 }
      (b1._1, b1._2 + b2._2)
    }
    def finish(b: (Array[Double], Double)): Seq[Double] =
      if (b._2 == 0.0) Seq.fill(dim)(0.0)
      else b._1.map(_ / b._2).toSeq
    def bufferEncoder: Encoder[(Array[Double], Double)] = Encoders.kryo[(Array[Double], Double)]
    def outputEncoder: Encoder[Seq[Double]] = org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }
}
