package graft.operators

import org.apache.spark.sql.{Dataset, Encoder, KeyValueGroupedDataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** The reference's complete reachable API surface (SURVEY.md §2.1), as a
  * thin typed layer over Dataset/KeyValueGroupedDataset.
  *
  * mini-flink's user surface is exactly: sources, `map` / `flatMap` /
  * `filter` (`DataStream.java:136,148,160`), `keyBy` (`DataStream.java:131`)
  * and keyed running `reduce` (`KeyedStream.java:206`), plus sinks. Here
  * each call delegates straight to the Spark typed API — there is no graph
  * builder, no serializer stack, no scheduler: Catalyst + Tungsten replace
  * all of it (SURVEY.md §3.4). The vestigial §2.3 surface
  * (sum/min/max/minBy/maxBy, KeyedProcessFunction) is first-class here.
  *
  * Scale note: typed lambdas are opaque to Catalyst (no pushdown through
  * them), mirroring the reference's opaque-UDF model. Hot analytical paths
  * should use the column-expression queries in graft.queries; this layer
  * exists for black-box user logic — the thing the reference was for.
  */
final class GraftStream[T](val ds: Dataset[T]) extends Serializable {

  /** T1 — 1→1 transform (ref: StreamMap.java:40). */
  def map[R: Encoder](f: T => R): GraftStream[R] = new GraftStream(ds.map(f))

  /** T2 — 1→N transform (ref: StreamFlatMap.java:48). */
  def flatMap[R: Encoder](f: T => IterableOnce[R]): GraftStream[R] =
    new GraftStream(ds.flatMap(f))

  /** T3 — predicate filter (ref: StreamFilter.java:38). */
  def filter(p: T => Boolean): GraftStream[T] = new GraftStream(ds.filter(p))

  /** T4 — hash-partition by key; scopes downstream state
    * (ref: KeyedStream.java:74-82 → KeyGroupStreamPartitioner). The
    * physical analog of the reference's 128 key groups is Spark's
    * HashPartitioning over spark.sql.shuffle.partitions. */
  def keyBy[K: Encoder](k: T => K): KeyedGraftStream[K, T] =
    new KeyedGraftStream(ds.groupByKey(k))

  /** union (absent in the reference, §2.4 — no multi-input operators at
    * all; first-class here). */
  def union(other: GraftStream[T]): GraftStream[T] =
    new GraftStream(ds.union(other.ds))

  /** G1 — parallelism control (ref: SingleOutputStreamOperator.java:73). */
  def setParallelism(n: Int): GraftStream[T] = new GraftStream(ds.repartition(n))

  /** K1 — print sink (ref: PrintSinkFunction.java:40). */
  def print(): Unit = ds.show(false)
}

object GraftStream {
  /** S1 — fromElements/fromCollection (ref:
    * StreamExecutionEnvironment.java:159,176; FromElementsFunction.java:14).
    * Elements become a local-relation Dataset — no pre-serialization step
    * needed (Encoders are codegen'd at plan time). */
  def fromElements[T: Encoder](spark: org.apache.spark.sql.SparkSession,
      elems: T*): GraftStream[T] =
    new GraftStream(spark.createDataset(elems))

  def fromDataset[T](ds: Dataset[T]): GraftStream[T] = new GraftStream(ds)
}

final class KeyedGraftStream[K, T](val kv: KeyValueGroupedDataset[K, T])
    extends Serializable {

  /** T5 batch view — per-key FINAL reduced state (the last element of the
    * reference's running emission, StreamGroupedReduce.java:35-53). */
  def reduce(f: (T, T) => T): Dataset[(K, T)] = kv.reduceGroups(f)

  /** T5 streaming view — the running reduce with UPDATE emission: one
    * updated aggregate per key per micro-batch (per ELEMENT when the
    * harness feeds single-element batches — SURVEY.md §7.4.1). State is
    * one value per key in the state store, exactly the reference's
    * ValueState<T> (ValueState.java:40, state read/update/collect cycle
    * StreamGroupedReduce.java:44-52). */
  def runningReduce(f: (T, T) => T)(implicit et: Encoder[T],
      ekt: Encoder[(K, T)], ek: Encoder[K]): Dataset[(K, T)] =
    kv.flatMapGroupsWithState[T, (K, T)](
      OutputMode.Update, GroupStateTimeout.NoTimeout) {
      (key: K, values: Iterator[T], state: GroupState[T]) =>
        var acc: Option[T] = state.getOption
        var any = false
        values.foreach { v =>
          any = true
          acc = Some(acc.fold(v)(f(_, v)))
        }
        if (any) { state.update(acc.get); Iterator((key, acc.get)) }
        else Iterator.empty
    }

  /** §2.3 vestigial field aggregations, first-class (ref intent:
    * SumAggregator.java:33, ComparableAggregator.java:31 — no API entry
    * point there). */
  def sumBy[N](num: Numeric[N])(f: T => N)(implicit ekn: Encoder[(K, N)],
      ek: Encoder[K], en: Encoder[N]): Dataset[(K, N)] =
    kv.mapValues(f).reduceGroups((a: N, b: N) => num.plus(a, b))

  def minBy(f: T => Double)(implicit et: Encoder[T], ekt: Encoder[(K, T)]): Dataset[(K, T)] =
    kv.reduceGroups((a: T, b: T) => if (f(b) < f(a)) b else a)

  def maxBy(f: T => Double)(implicit et: Encoder[T], ekt: Encoder[(K, T)]): Dataset[(K, T)] =
    kv.reduceGroups((a: T, b: T) => if (f(b) > f(a)) b else a)

  /** KeyedProcessFunction analog (ref: KeyedProcessFunction.java:52 —
    * declared but unreachable there, SURVEY.md §2.3): element-at-a-time
    * processing with per-key state and timeout-driven timers, via
    * flatMapGroupsWithState. `onTimeout` fires when the group times out —
    * the GroupStateTimeout analog of onTimer
    * (InternalTimerServiceImpl.java:165-214). */
  def process[S: Encoder, R: Encoder](
      timeout: GroupStateTimeout,
      onElements: (K, Iterator[T], GroupState[S]) => Iterator[R],
      onTimeout: (K, GroupState[S]) => Iterator[R]): Dataset[R] =
    kv.flatMapGroupsWithState[S, R](OutputMode.Update, timeout) {
      (key: K, values: Iterator[T], state: GroupState[S]) =>
        if (state.hasTimedOut) onTimeout(key, state)
        else onElements(key, values, state)
    }
}
