package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders, TypedColumn}

/** Misra–Gries heavy-hitters sketch as a typed Spark `Aggregator` —
  * the §2.10 custom-aggregate tier for the one summary the exact
  * `txt_vocab_topk` plan cannot provide at unbounded vocabulary: a
  * FIXED-MEMORY (k−1 counters per partial) frequency summary with the
  * classic guarantees
  *
  *   - any item with true count > N/k is present in the sketch,
  *   - every estimate is an undercount by at most N/k
  *
  * (N = stream length). Partials merge by counter addition followed by
  * one rank-k reduction (Agarwal et al. 2012, "Mergeable Summaries"),
  * so the map-side combine absorbs each partition into k−1 counters and
  * the shuffle carries O(k) rows per partition REGARDLESS of vocabulary
  * size — the property that matters when the key space itself is the
  * scaling hazard. Estimated counts depend on partitioning (any MG
  * sketch's do); the GUARANTEES hold for every partitioning, which is
  * what the spec pins. Use the exact top-k plan when the vocabulary
  * fits a shuffle; use this when it doesn't.
  */
object HeavyHitters {

  /** `k` bounds memory (k−1 counters) and error (N/k). */
  final case class MisraGries(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    require(k >= 2, s"MisraGries needs k >= 2, got $k")

    override def zero: Map[String, Long] = Map.empty

    override def reduce(buf: Map[String, Long], item: String): Map[String, Long] =
      buf.get(item) match {
        case Some(c) => buf.updated(item, c + 1L)
        case None if buf.size < k - 1 => buf.updated(item, 1L)
        case None =>
          // decrement-all step: drop one occurrence of every tracked item
          // AND the incoming one (classic MG; zeros evicted)
          buf.collect { case (t, c) if c > 1L => t -> (c - 1L) }
      }

    override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      val summed = b.foldLeft(a) { case (acc, (t, c)) =>
        acc.updated(t, acc.getOrElse(t, 0L) + c)
      }
      if (summed.size <= k - 1) summed
      else {
        // subtract the k-th largest count from everything, keep positives
        // — the mergeable-summaries reduction that preserves both bounds
        val kth = summed.values.toSeq.sorted(Ordering[Long].reverse)(k - 1)
        summed.collect { case (t, c) if c > kth => t -> (c - kth) }
      }
    }

    override def finish(reduction: Map[String, Long]): Map[String, Long] = reduction

    override def bufferEncoder: Encoder[Map[String, Long]] =
      Encoders.kryo[Map[String, Long]]

    override def outputEncoder: Encoder[Map[String, Long]] =
      Encoders.kryo[Map[String, Long]]
  }

  /** Typed column for `ds.select(...)` / `groupByKey(...).agg(...)`. */
  def misraGries(k: Int): TypedColumn[String, Map[String, Long]] =
    MisraGries(k).toColumn
}
