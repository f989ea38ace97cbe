package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** `graft-seq`: a DataSource V2 custom source — the reference's S2 surface
  * (`SourceFunction.java:29-52`: a user-defined run loop emitting elements
  * into the stream, wrapped by `StreamSource.java:43`) expressed as Spark's
  * production connector API instead of a thread with a lock.
  *
  * Semantics: emits the deterministic sequence `[start, end)` as one
  * non-null `id BIGINT` column. Everything that makes a V2 *streaming*
  * connector a connector is here and real:
  *
  *  - **Offsets are the contract.** A [[SeqOffset]] is "rows offered so
  *    far"; it serializes to JSON in the checkpoint's offset log, and any
  *    `[start', end')` range is replayable on demand — exactly-once
  *    delivery falls out of deterministic range replay + the sink's
  *    transactionality, never from source-side dedup state.
  *  - **Admission control.** [[SupportsAdmissionControl]]: each trigger
  *    the engine passes the last available offset + a [[ReadLimit]], and
  *    the source admits at most `rowsPerBatch` more — the G2 rate knob as
  *    a source property (≙ `maxOffsetsPerTrigger`), bounding per-batch
  *    work no matter how far behind the query is.
  *  - **Partitioned reads.** Each micro-batch's range splits into
  *    `numPartitions` contiguous slices, one [[PartitionReader]] per
  *    slice, so a batch scans in parallel across executors; the reader
  *    itself is O(1)-memory (a counter, not a buffer).
  *  - **Restart recovery.** A restarted query passes the checkpoint log's
  *    last offset straight into `latestOffset(start, limit)`, so a cold
  *    connector instance resumes exactly after the last commit with no
  *    duplicate or skipped range (SeqSourceSpec drives three cold
  *    single-trigger runs + a draining restart over one checkpoint).
  *
  * The batch path (`spark.read.format("graft-seq")`) shares the same
  * partition planning and reader — one connector, both execution modes
  * (TableCapability.BATCH_READ + MICRO_BATCH_READ).
  */
class SeqSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-seq"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SeqSource.SCHEMA
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SeqTable(SeqOptions.from(properties))
}

object SeqSource {
  val SCHEMA: StructType =
    StructType(Seq(StructField("id", LongType, nullable = false)))
}

/** Validated connector options; analysis-time failure on bad config. */
final case class SeqOptions(
    start: Long, end: Long, rowsPerBatch: Long, numPartitions: Int)

object SeqOptions {
  def from(props: util.Map[String, String]): SeqOptions = {
    // DSv2 convention: data source options are case-insensitive
    val ci = new CaseInsensitiveStringMap(props)
    def opt(k: String): Option[String] =
      Option(ci.get(k)).map(_.trim).filter(_.nonEmpty)
    val end = opt("end").map(_.toLong).getOrElse(
      throw new IllegalArgumentException(
        "graft-seq: required option 'end' (exclusive upper bound) is missing"))
    val start = opt("start").map(_.toLong).getOrElse(0L)
    require(start >= 0, s"graft-seq: start ($start) must be >= 0")
    require(end >= start, s"graft-seq: end ($end) must be >= start ($start)")
    val rowsPerBatch =
      opt("rowsPerBatch").map(_.toLong).getOrElse(math.max(end - start, 1L))
    require(rowsPerBatch > 0,
      s"graft-seq: rowsPerBatch ($rowsPerBatch) must be positive")
    val numPartitions = opt("numPartitions").map(_.toInt).getOrElse(4)
    require(numPartitions > 0,
      s"graft-seq: numPartitions ($numPartitions) must be positive")
    SeqOptions(start, end, rowsPerBatch, numPartitions)
  }
}

final class SeqTable(opts: SeqOptions) extends Table with SupportsRead {
  override def name(): String = s"graft-seq[${opts.start},${opts.end})"
  override def schema(): StructType = SeqSource.SCHEMA
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new SeqScan(opts)
    }
}

final class SeqScan(opts: SeqOptions) extends Scan {
  override def readSchema(): StructType = SeqSource.SCHEMA
  override def description(): String =
    s"graft-seq [${opts.start}, ${opts.end}) x${opts.numPartitions}"
  override def toBatch: Batch = new SeqBatch(opts)
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new SeqMicroBatchStream(opts)
}

/** Offset = count of rows offered from the head of the sequence. */
final case class SeqOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

final class SeqMicroBatchStream(opts: SeqOptions)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  /** End snapshot for a Trigger.AvailableNow run (the backfill-drain
    * pattern: process everything available at start, in rate-limited
    * batches, then terminate). The sequence's head is statically `end`,
    * so the snapshot is a constant; a feed-backed connector would capture
    * its current head offset here. */
  private var availableNowCap: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(opts.end)

  override def initialOffset(): Offset = SeqOffset(opts.start)

  /** Admission control proper: the engine hands in the last available
    * offset (deserialized from the checkpoint log on restart) and the read
    * limit, and the source answers "how far may this trigger go" — pure
    * arithmetic, no connector-instance state, so recovery is correct by
    * construction (a cold instance resumes exactly after the last commit). */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[SeqOffset].n
    val step = limit match {
      case r: ReadMaxRows => r.maxRows()
      case _ => opts.rowsPerBatch
    }
    val cap = availableNowCap.getOrElse(opts.end)
    SeqOffset(math.min(cap, s + step))
  }

  /** The G2 rate knob as the connector's declared default limit. */
  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(opts.rowsPerBatch)

  /** True head of the unbounded range (progress reporting / backlog). */
  override def reportLatestOffset(): Offset = SeqOffset(opts.end)

  /** With SupportsAdmissionControl the engine always calls the two-arg
    * variant; the legacy path cannot know the restart position. */
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "graft-seq uses SupportsAdmissionControl.latestOffset(start, limit)")

  override def deserializeOffset(json: String): Offset =
    SeqOffset(json.trim.toLong)

  override def commit(end: Offset): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    SeqBatch.slices(
      start.asInstanceOf[SeqOffset].n,
      end.asInstanceOf[SeqOffset].n,
      opts.numPartitions)

  override def createReaderFactory(): PartitionReaderFactory = SeqReaderFactory

  override def stop(): Unit = ()
}

final class SeqBatch(opts: SeqOptions) extends Batch {
  override def planInputPartitions(): Array[InputPartition] =
    SeqBatch.slices(opts.start, opts.end, opts.numPartitions)
  override def createReaderFactory(): PartitionReaderFactory = SeqReaderFactory
}

object SeqBatch {
  /** `[s, e)` as `n` contiguous slices (empty slices dropped). Bounds are
    * computed as `base*i + min(i, rem)` — never `i * total`, which
    * overflows Long for ranges past ~Long.MaxValue/n and would silently
    * plan garbage slices. The first `rem` slices carry one extra row. */
  def slices(s: Long, e: Long, n: Int): Array[InputPartition] = {
    val total = math.max(e - s, 0L)
    val base = total / n
    val rem = total % n
    def lo(i: Int): Long = s + base * i + math.min(i.toLong, rem)
    (0 until n).iterator
      .map(i => SeqInputPartition(lo(i), lo(i + 1)))
      .filter(p => p.hi > p.lo)
      .toArray
  }
}

final case class SeqInputPartition(lo: Long, hi: Long) extends InputPartition

object SeqReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SeqInputPartition]
    new PartitionReader[InternalRow] {
      private var cur = p.lo - 1
      override def next(): Boolean = { cur += 1; cur < p.hi }
      override def get(): InternalRow = InternalRow(cur)
      override def close(): Unit = ()
    }
  }
}
