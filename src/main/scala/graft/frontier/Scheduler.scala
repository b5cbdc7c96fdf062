package graft.frontier

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.model.Candidate

/** Per-host politeness priority dequeue (W1/W2 in SURVEY.md §2.5).
  *
  * Crawl ordering (the parity-critical total order, FIXTURES.md §4):
  * within an epoch a host schedules at most `budget` URLs, chosen by
  * (priority DESC, canonical_url ASC). The global order of a scheduled
  * batch is (host, priority DESC, url ASC).
  *
  * Scale: a naive groupBy(host) shuffles hot hosts (Zipf head) into single
  * tasks. Two-phase top-k kills the skew: a salted partial top-k first
  * (each host split across `saltFactor` groups, bounded heap of size
  * `budget` each), then the final per-host top-k merges at most
  * `saltFactor * budget` rows per host — O(budget) memory per task, never
  * O(candidates-per-host). Both phases use bounded heaps, not sorts.
  */
object Scheduler {

  final case class Config(perHostBudget: Int = 16, saltFactor: Int = 8)

  /** Candidate order: best first. */
  private val best: Ordering[Candidate] =
    Ordering.by((c: Candidate) => (-c.priority, c.url))

  /** Keep the top `k` candidates of an iterator with a bounded heap. */
  private def topK(k: Int, it: Iterator[Candidate]): Iterator[Candidate] = {
    // max-heap on `best.reverse` head = worst kept element
    val heap = new scala.collection.mutable.PriorityQueue[Candidate]()(best)
    for (c <- it) {
      if (heap.size < k) heap.enqueue(c)
      else if (best.lt(c, heap.head)) { heap.dequeue(); heap.enqueue(c) }
    }
    heap.toVector.sorted(best).iterator
  }

  private def salt(url: String, factor: Int): Int =
    (((url.hashCode.toLong % factor) + factor) % factor).toInt

  /** Dequeue with the within-host rank attached: the final top-k emits in
    * (priority DESC, url ASC) order per host, so the rank is free — no
    * global sort/zipWithIndex pass needed for a deterministic total order
    * (host ASC, rank ASC). */
  def dequeueRanked(spark: SparkSession, candidates: Dataset[(Candidate, Int)],
                    cfg: Config): Dataset[(Candidate, Int)] = {
    import spark.implicits._
    val partial = candidates
      .groupByKey { case (c, _) => (c.host, salt(c.url, cfg.saltFactor)) }
      .flatMapGroups { (_, it) =>
        val buf = it.buffered
        val budget = math.min(cfg.perHostBudget, math.max(1, buf.head._2))
        topK(budget, buf.map(_._1)).map(c => (c, budget))
      }
    partial
      .groupByKey(_._1.host)
      .flatMapGroups { (_, it) =>
        val buf = it.buffered
        val budget = math.min(cfg.perHostBudget, math.max(1, buf.head._2))
        topK(budget, buf.map(_._1)).zipWithIndex.map { case (c, r) => (c, r) }
      }
  }

}
