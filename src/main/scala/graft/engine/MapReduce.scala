package graft.engine

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.expressions.Aggregator

/** The reference's generalized MapReduce contract, made real on Spark.
  *
  * The reference (Noahnut/MapReduceGo) declares `Map: []byte => []KeyValue`
  * and `Reduce: (key, []values) => value` (`mpWorker/worker.go:21-22`,
  * `test/wordCount.go:14-32`) but never implements the Reduce phase
  * (`mpWorker/worker.go:207-209` is a stub). Here the whole pipeline is
  * three Spark primitives: `flatMap` (map phase), the shuffle implied by
  * `groupByKey` (the reference's FNV-1a hash partitioning,
  * `mpWorker/worker.go:59-63,142-151`), and `mapGroups`/`Aggregator`
  * (reduce phase). Partition-count invariance — which the reference
  * violates by deriving the reducer count from the live worker table
  * (`mpMaster/master.go:222`, SURVEY §1.4-Q5) — holds by construction.
  */
object MapReduce {

  /** Map phase: one input record fans out to 0..n key/value pairs.
    * Ref contract: `mpWorker/worker.go:21` (`MapFun`). */
  def mapFlat[T, K, V](ds: Dataset[T])(f: T => IterableOnce[(K, V)])(implicit
      enc: Encoder[(K, V)]): Dataset[(K, V)] =
    ds.flatMap(f)

  /** Reduce phase in the reference's exact shape: the user function sees
    * the full value iterator for a key (`mpWorker/worker.go:22`,
    * `ReduceFun`). One shuffle; no partial aggregation (use
    * [[FoldAggregator]] when the fold is associative and combiner
    * pushdown matters at scale). */
  def reduceByKey[K, V, R](pairs: Dataset[(K, V)])(f: (K, Iterator[V]) => R)(implicit
      kenc: Encoder[K], renc: Encoder[(K, R)]): Dataset[(K, R)] =
    pairs.groupByKey(_._1).mapGroups((k, it) => (k, f(k, it.map(_._2))))

  /** Associative/commutative fold form of the Reduce contract. Registered
    * through `functions.udaf` this becomes a Catalyst aggregate with
    * map-side partial aggregation — the combiner the reference lacks
    * (it ships every raw `(word,"1")` pair over the network,
    * `mpWorker/worker.go:142-151`). */
  class FoldAggregator[V, B, R](z: => B, step: (B, V) => B, comb: (B, B) => B, fin: B => R)(
      implicit benc: Encoder[B], renc: Encoder[R])
      extends Aggregator[V, B, R] {
    def zero: B = z
    def reduce(b: B, a: V): B = step(b, a)
    def merge(x: B, y: B): B = comb(x, y)
    def finish(b: B): R = fin(b)
    def bufferEncoder: Encoder[B] = benc
    def outputEncoder: Encoder[R] = renc
  }
}
