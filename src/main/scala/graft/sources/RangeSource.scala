package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector for a deterministic synthetic event stream —
  * the REST/Mongo extract stage of the reference DAG (dag.py:369-406) as a
  * first-class Spark source instead of a driver-side fetch loop.
  *
  * Scale behaviors a 100 TB connector must have, all implemented and
  * observable in `explain`/specs:
  *  - **Column pruning** (SupportsPushDownRequiredColumns): the reader
  *    materializes only requested fields, in the requested order.
  *  - **Filter pushdown** (SupportsPushDownFilters): range predicates on
  *    `id` narrow the generated [lo, hi) window at PLANNING time — the
  *    analog of partition pruning. id-range bounds are consumed EXACTLY
  *    by the generator window (not returned as residual — which is what
  *    makes the aggregate pushdown legal); only non-id predicates stay
  *    residual for Spark to re-check.
  *  - **Partition parallelism**: the (narrowed) range splits into
  *    `slices` independent input partitions.
  *  - **Limit / TopN pushdown** (SupportsPushDownLimit/TopN): `LIMIT n`
  *    (and `ORDER BY id … LIMIT n`) shrink the window to its first (asc)
  *    or last (desc) n indices at planning time — generation stops at n
  *    rows instead of materializing the range and discarding it.
  *
  * The row function is pure modular arithmetic on the row index, so any
  * engine reproduces it exactly (the q71 oracle regenerates it in DuckDB
  * with `range()`): user = i % users; etype cycles through 5 values;
  * value = ((i·2654435761) mod 10⁶) / 100.
  *
  * Usage: `spark.read.format("graft.sources.RangeSource")
  *   .option("rows", n).option("users", u).option("slices", s).load()`.
  */
class RangeSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RangeSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new RangeTable(
      java.lang.Long.parseLong(properties.getOrDefault("rows", "100000")),
      java.lang.Long.parseLong(properties.getOrDefault("users", "50")),
      Integer.parseInt(properties.getOrDefault("slices", "8")))
}

object RangeSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("uid", LongType, nullable = false),
    StructField("etype", StringType, nullable = false),
    StructField("value", DoubleType, nullable = false)))
  val etypes: Array[String] =
    Array("view", "click", "purchase", "signup", "error")

  def valueOf(i: Long): Double = ((i * 2654435761L) % 1000000L) / 100.0
}

private[sources] class RangeTable(rows: Long, users: Long, slices: Int)
    extends Table with SupportsRead {
  override def name(): String = s"graft_range($rows)"
  override def schema(): StructType = RangeSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new RangeScanBuilder(rows, users, slices)
}

private[sources] class RangeScanBuilder(rows: Long, users: Long, slices: Int)
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates
    with SupportsPushDownLimit with SupportsPushDownTopN {
  import org.apache.spark.sql.connector.expressions.{NamedReference, SortDirection, SortOrder}
  import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar, Max, Min}

  private var lo = 0L
  private var hi = rows
  private var pushed: Array[Filter] = Array.empty
  private var residual: Array[Filter] = Array.empty
  private var required: StructType = RangeSource.schema
  private var aggFuncs: Option[Seq[String]] = None

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // v+1 guards: an exclusive bound at Long.MaxValue must not wrap.
    def succ(v: Long): Long = if (v == Long.MaxValue) v else v + 1
    pushed = filters.filter {
      case GreaterThan("id", v: Long)        => lo = math.max(lo, succ(v)); true
      case GreaterThanOrEqual("id", v: Long) => lo = math.max(lo, v); true
      case LessThan("id", v: Long)           => hi = math.min(hi, v); true
      case LessThanOrEqual("id", v: Long)    => hi = math.min(hi, succ(v)); true
      case EqualTo("id", v: Long) =>
        lo = math.max(lo, v); hi = math.min(hi, succ(v)); true
      case _ => false
    }
    // id-range bounds are consumed EXACTLY by the generator window, so
    // they are not residual — which is also what makes the aggregate
    // pushdown below legal (Spark only pushes aggregates over a scan with
    // no post-scan filters). Everything else stays residual.
    residual = filters.diff(pushed)
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** LIMIT n stops generation at PLANNING time: the window shrinks to its
    * first n indices. Spark only pushes a limit when every filter was
    * consumed, but guard anyway (a residual filter would make the cut
    * semantically wrong); the aggregate path answers from bounds and
    * needs no limit. isPartiallyPushed stays true (the default), so Spark
    * re-applies the limit above the scan — free on ≤n rows, and it keeps
    * the contract local. */
  // Both pushdown traits default this to true; Scala requires one explicit
  // override when two defaults collide. Keeping it true means Spark
  // re-applies limit/sort above the ≤n-row scan — local, and free.
  override def isPartiallyPushed(): Boolean = true

  private def saturatingEnd(n: Int): Long =
    if (Long.MaxValue - lo < n.toLong) Long.MaxValue else lo + n
  override def pushLimit(limit: Int): Boolean =
    if (aggFuncs.isDefined || residual.nonEmpty || limit < 0) false
    else { hi = math.min(hi, saturatingEnd(limit)); true }

  /** ORDER BY id LIMIT n — TopN pushdown: ascending keeps the window's
    * FIRST n indices, descending its LAST n. Only the id ordering maps to
    * the generator's index order; any other sort column stays in Spark. */
  override def pushTopN(orders: Array[SortOrder], limit: Int): Boolean = {
    val byId = orders.length == 1 && (orders(0).expression() match {
      case nr: NamedReference => nr.fieldNames.sameElements(Array("id"))
      case _ => false
    })
    if (!byId || aggFuncs.isDefined || residual.nonEmpty || limit < 0) false
    else {
      if (orders(0).direction() == SortDirection.ASCENDING)
        hi = math.min(hi, saturatingEnd(limit))
      else lo = math.max(lo, if (hi - lo > limit) hi - limit else lo)
      true
    }
  }

  /** COUNT(*) / MIN(id) / MAX(id) over the narrowed window are closed-form
    * at PLANNING time (the window is [lo, hi)) — the scan answers them in
    * one row without generating anything. Only legal when no residual
    * filter survives and there is no grouping. */
  private def canPush(agg: Aggregation): Boolean = {
    def isId(e: org.apache.spark.sql.connector.expressions.Expression): Boolean =
      e match {
        case nr: NamedReference => nr.fieldNames.sameElements(Array("id"))
        case _ => false
      }
    residual.isEmpty && agg.groupByExpressions().isEmpty &&
      agg.aggregateExpressions().nonEmpty &&
      agg.aggregateExpressions().forall {
        case _: CountStar => true
        case m: Min => isId(m.column)
        case m: Max => isId(m.column)
        case _ => false
      }
  }
  override def supportCompletePushDown(agg: Aggregation): Boolean = canPush(agg)
  override def pushAggregation(agg: Aggregation): Boolean =
    if (!canPush(agg)) false
    else {
      aggFuncs = Some(agg.aggregateExpressions().map {
        case _: CountStar => "count"
        case _: Min => "min"
        case _: Max => "max"
      }.toSeq)
      true
    }

  override def build(): Scan = {
    val l = math.max(lo, 0L); val h = math.max(hi, lo)
    aggFuncs match {
      case Some(funcs) => new RangeAggScan(l, h, funcs)
      case None => new RangeScan(l, h, users, slices, required)
    }
  }
}

/** Completely-pushed-down aggregate scan: ONE row, computed driver-side
  * from the window bounds — no partitions are generated at all. */
private[sources] class RangeAggScan(lo: Long, hi: Long, funcs: Seq[String])
    extends Scan with Batch {
  private val n = math.max(hi - lo, 0L)
  override def readSchema(): StructType = StructType(funcs.zipWithIndex.map {
    case ("count", i) => StructField(s"agg_$i", LongType, nullable = false)
    case (_, i)       => StructField(s"agg_$i", LongType, nullable = true)
  })
  override def toBatch: Batch = this
  override def description(): String =
    s"graft_range AGG-pushdown [lo=$lo, hi=$hi, funcs=${funcs.mkString(",")}]"
  override def planInputPartitions(): Array[InputPartition] =
    Array(RangePartition(0L, 1L))
  override def createReaderFactory(): PartitionReaderFactory =
    new RangeAggReaderFactory(lo, hi, funcs)
}

private[sources] class RangeAggReaderFactory(lo: Long, hi: Long,
                                             funcs: Seq[String])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val n = math.max(hi - lo, 0L)
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = { val r = !emitted; emitted = true; r }
      override def get(): InternalRow = InternalRow.fromSeq(funcs.map {
        case "count" => n
        case "min" => if (n > 0) lo else null
        case "max" => if (n > 0) hi - 1 else null
      })
      override def close(): Unit = ()
    }
  }
}

private[sources] case class RangePartition(start: Long, end: Long)
    extends InputPartition

private[sources] class RangeScan(lo: Long, hi: Long, users: Long, slices: Int,
                                 required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft_range [lo=$lo, hi=$hi, cols=${required.fieldNames.mkString(",")}]"
  override def planInputPartitions(): Array[InputPartition] =
    RangeScan.slice(lo, hi, slices)
  override def createReaderFactory(): PartitionReaderFactory =
    new RangeReaderFactory(users, required.fieldNames)
  // Streaming form: the same generator exposed as a micro-batch stream —
  // offsets are row indices, each trigger reads [start, end) with the
  // same sliced partitions and pruned schema as the batch path.
  override def toMicroBatchStream(checkpointLocation: String):
      org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new RangeMicroBatchStream(lo, hi, users, slices, required)
}

private[sources] object RangeScan {
  def slice(lo: Long, hi: Long, slices: Int): Array[InputPartition] = {
    val n = math.max(hi - lo, 0L)
    if (n == 0L) Array.empty
    else {
      val per = math.max(1L, (n + slices - 1) / slices)
      (lo until hi by per).map(s =>
        RangePartition(s, math.min(s + per, hi)): InputPartition).toArray
    }
  }
}

private[sources] case class RangeOffset(n: Long)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = n.toString
}

private[sources] class RangeMicroBatchStream(lo: Long, hi: Long, users: Long,
                                             slices: Int, required: StructType)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream {
  import org.apache.spark.sql.connector.read.streaming.Offset
  override def initialOffset(): Offset = RangeOffset(lo)
  override def latestOffset(): Offset = RangeOffset(hi)
  override def deserializeOffset(json: String): Offset =
    RangeOffset(java.lang.Long.parseLong(json))
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    RangeScan.slice(start.asInstanceOf[RangeOffset].n,
      end.asInstanceOf[RangeOffset].n, slices)
  override def createReaderFactory(): PartitionReaderFactory =
    new RangeReaderFactory(users, required.fieldNames)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private[sources] class RangeReaderFactory(users: Long, fields: Array[String])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val rp = p.asInstanceOf[RangePartition]
    new PartitionReader[InternalRow] {
      private var i = rp.start - 1
      override def next(): Boolean = { i += 1; i < rp.end }
      override def get(): InternalRow = InternalRow.fromSeq(fields.map {
        case "id" => i
        case "uid" => i % users
        case "etype" =>
          UTF8String.fromString(RangeSource.etypes((i % 5).toInt))
        case "value" => RangeSource.valueOf(i)
      }.toSeq)
      override def close(): Unit = ()
    }
  }
}
