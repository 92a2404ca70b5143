package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector for a PAGED EXTERNAL EXTRACT — the reference
  * DAG's REST extraction loop (dag.py:170-365: auth'd paged GETs with
  * limit/offset, retry-and-continue, accumulate-then-DataFrame) re-shaped
  * as a first-class Spark source. The driver-side `for offset in
  * range(0,1000,50)` fetch loop becomes PLANNING-TIME page slicing: the
  * page space is discovered once on the driver, split into contiguous
  * page ranges, and each range is fetched INSIDE an executor task — so
  * extraction parallelizes, restarts per-task on failure, and feeds
  * Catalyst directly instead of round-tripping through a driver list.
  *
  * Scale behaviors, all observable in explain/specs:
  *  - **Planning-time page slicing**: the page count comes from the
  *    `pages` option (a real API's `total` field) or a bounded existence
  *    probe; [0, nPages) splits into `slices` contiguous InputPartitions.
  *  - **Per-partition fetch with bounded retry**: each page fetch retries
  *    up to `maxRetries` times with linear backoff (`retryWaitMs`) before
  *    failing the task — the connector-level analog of the reference's
  *    try/except-continue, but visible to Spark's own task retry.
  *  - **Column pruning** (SupportsPushDownRequiredColumns): only the
  *    requested JSON fields are parsed into rows.
  *  - **Micro-batch streaming with a page cursor**: the stream offset IS
  *    the next page index; `latestOffset` re-probes the endpoint, so a
  *    producer appending pages drives incremental batches, and a
  *    checkpoint restart resumes from the committed cursor instead of
  *    re-fetching history.
  *
  * The endpoint here is fixture-backed ([[PagedEndpoint]]): page `i` is
  * `dir/page-%05d.jsonl`, transient failures are injected via a
  * `flaky-%05d` attempt counter. A production build swaps the file I/O in
  * [[PagedEndpoint.fetch]] for an HTTP GET (auth header, offset params) —
  * every planning, slicing, retry, pruning, and cursor mechanism above is
  * endpoint-agnostic.
  *
  * Usage: `spark.read.format("graft.sources.PagedSource")
  *   .option("dir", dir).option("slices", 8)
  *   .option("schema", "doc_id LONG, text STRING").load()` — omit
  * `schema` to infer it from a bounded sample of page 0.
  */
class PagedSource extends TableProvider {
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    Option(options.get("schema")) match {
      case Some(ddl) => StructType.fromDDL(ddl)
      case None => PagedEndpoint.inferFromFirstPage(options.get("dir"))
    }
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table = {
    val conf = PagedConf(
      dir = properties.get("dir"),
      slices = Integer.parseInt(properties.getOrDefault("slices", "8")),
      maxRetries = Integer.parseInt(properties.getOrDefault("maxRetries", "3")),
      retryWaitMs = java.lang.Long.parseLong(properties.getOrDefault("retryWaitMs", "10")),
      declaredPages = Option(properties.get("pages")).map(Integer.parseInt),
      maxPages = Integer.parseInt(properties.getOrDefault("maxPages", "100000")))
    require(conf.dir != null, "PagedSource requires option 'dir'")
    new PagedTable(conf, schema)
  }
}

private[sources] case class PagedConf(dir: String, slices: Int,
                                      maxRetries: Int, retryWaitMs: Long,
                                      declaredPages: Option[Int], maxPages: Int)

/** The fixture-backed endpoint protocol (see [[PagedSource]] class doc)
  * plus the fixture writer tests and contract queries use. */
object PagedEndpoint {

  def pageFile(dir: String, page: Int): java.io.File =
    new java.io.File(dir, f"page-$page%05d.jsonl")
  private def flakyFile(dir: String, page: Int): java.io.File =
    new java.io.File(dir, f"flaky-$page%05d")

  /** One page fetch attempt. Injected transient failures: a
    * `flaky-%05d` file holding a positive int fails that many attempts
    * (decrementing), simulating rate-limit/5xx responses. */
  private def fetchOnce(dir: String, page: Int): Seq[String] = {
    val flaky = flakyFile(dir, page)
    if (flaky.exists()) {
      val left = new String(java.nio.file.Files.readAllBytes(flaky.toPath),
        "UTF-8").trim.toInt
      if (left > 0) {
        java.nio.file.Files.write(flaky.toPath, (left - 1).toString.getBytes("UTF-8"))
        throw new java.io.IOException(
          s"simulated transient failure on page $page ($left left)")
      }
    }
    val f = pageFile(dir, page)
    if (!f.exists())
      throw new java.io.FileNotFoundException(s"page $page missing: $f")
    scala.io.Source.fromFile(f, "UTF-8").getLines().toVector
  }

  /** Bounded-retry fetch — linear backoff, rethrow after the budget. */
  def fetch(dir: String, page: Int, maxRetries: Int, waitMs: Long): Seq[String] = {
    var attempt = 0
    while (true) {
      try return fetchOnce(dir, page)
      catch {
        case e: Exception if attempt < maxRetries =>
          attempt += 1
          Thread.sleep(waitMs * attempt)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Page-space discovery: the declared count when the caller knows it (a
    * real API's `total`), else probe page existence 0,1,2,… up to
    * `maxPages` — pages are contiguous by protocol. */
  def pageCount(conf: PagedConf): Int = conf.declaredPages.getOrElse {
    var n = 0
    while (n < conf.maxPages && pageFile(conf.dir, n).exists()) n += 1
    n
  }

  /** Schema inference from a bounded sample of page 0 (first 100 lines):
    * field order is first appearance, types are the JSON node kinds
    * (integral → long, other number → double, bool, array → array of
    * string, else string), integral widening to double on conflict. */
  def inferFromFirstPage(dir: String): StructType = {
    require(dir != null, "PagedSource requires option 'dir'")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val lines =
      if (pageFile(dir, 0).exists()) fetch(dir, 0, maxRetries = 0, waitMs = 0).take(100)
      else Seq.empty
    val fields = scala.collection.mutable.LinkedHashMap.empty[String, DataType]
    lines.foreach { line =>
      val node = mapper.readTree(line)
      val it = node.fields()
      while (it.hasNext) {
        val e = it.next()
        val t: DataType =
          if (e.getValue.isIntegralNumber) LongType
          else if (e.getValue.isNumber) DoubleType
          else if (e.getValue.isBoolean) BooleanType
          else if (e.getValue.isArray) ArrayType(StringType)
          else StringType
        fields.get(e.getKey) match {
          case None => fields(e.getKey) = t
          case Some(LongType) if t == DoubleType => fields(e.getKey) = DoubleType
          case Some(prev) if prev != t && !(prev == DoubleType && t == LongType) =>
            fields(e.getKey) = StringType // irreconcilable → string
          case _ => ()
        }
      }
    }
    StructType(fields.map { case (k, t) => StructField(k, t) }.toSeq)
  }

  /** Fixture writer: `df` must carry (`value`: one JSON line, `page`:
    * int). One distributed write partitioned by page (repartition on the
    * page key → exactly one part file per page directory), then a
    * driver-side rename pass — O(nPages) renames, never row-sized work.
    * Stands in for the external producer; tests and contract queries
    * build their endpoints with it. */
  def writeFixture(df: org.apache.spark.sql.DataFrame, dir: String): Int = {
    import org.apache.spark.sql.functions.col
    df.repartition(col("page")).write.mode("overwrite")
      .partitionBy("page").text(dir)
    val root = new java.io.File(dir)
    val pageDirs = root.listFiles().filter(f =>
      f.isDirectory && f.getName.startsWith("page="))
    var n = 0
    pageDirs.foreach { pd =>
      val page = pd.getName.stripPrefix("page=").toInt
      val part = pd.listFiles().filter(_.getName.startsWith("part-"))
      require(part.length == 1,
        s"expected exactly one part file per page, got ${part.length} in $pd")
      java.nio.file.Files.move(part(0).toPath, pageFile(dir, page).toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      pd.listFiles().foreach(_.delete()); pd.delete()
      n = math.max(n, page + 1)
    }
    n
  }

  /** Arm failure injection for a page: the next `failures` fetch attempts
    * of `page` throw. */
  def armFlaky(dir: String, page: Int, failures: Int): Unit =
    java.nio.file.Files.write(flakyFile(dir, page).toPath,
      failures.toString.getBytes("UTF-8"))
}

private[sources] class PagedTable(conf: PagedConf, schema0: StructType)
    extends Table with SupportsRead {
  override def name(): String = s"graft_paged(${conf.dir})"
  override def schema(): StructType = schema0
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PagedScanBuilder(conf, schema0)
}

private[sources] class PagedScanBuilder(conf: PagedConf, full: StructType)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownLimit {
  private var required: StructType = full
  private var limit: Option[Int] = None
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  // LIMIT n over a paged API must not crawl the API: the page walk is
  // lazy inside the reader, so capping emission stops fetching after
  // ceil(n / rowsPerPage) pages. Partially pushed — per-page row counts
  // are unknown at plan time, so Spark keeps the global limit operator
  // (any-n-rows semantics make the early stop sound regardless).
  override def pushLimit(n: Int): Boolean = { limit = Some(n); true }
  override def isPartiallyPushed(): Boolean = true
  override def build(): Scan = new PagedScan(conf, required, limit)
}

private[sources] case class PagedPartition(pStart: Int, pEnd: Int)
    extends InputPartition

private[sources] class PagedScan(conf: PagedConf, required: StructType,
                                 limit: Option[Int] = None)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft_paged [dir=${conf.dir}, cols=${required.fieldNames.mkString(",")}" +
      limit.map(n => s", limit=$n").getOrElse("") + "]"
  override def planInputPartitions(): Array[InputPartition] = limit match {
    // With a pushed limit, ONE sequential partition: `slices` parallel
    // partitions would each fetch their first page just to have most
    // rows discarded — a LIMIT-5 preview should cost one page, not eight.
    case Some(_) => PagedScan.slice(0, PagedEndpoint.pageCount(conf), 1)
    case None => PagedScan.slice(0, PagedEndpoint.pageCount(conf), conf.slices)
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new PagedReaderFactory(conf, required, limit.getOrElse(Int.MaxValue))
  override def toMicroBatchStream(checkpointLocation: String):
      org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new PagedMicroBatchStream(conf, required)
}

private[sources] object PagedScan {
  /** Contiguous page ranges, ≤ `slices` of them. */
  def slice(lo: Int, hi: Int, slices: Int): Array[InputPartition] = {
    val n = math.max(hi - lo, 0)
    if (n == 0) Array.empty
    else {
      val per = math.max(1, (n + slices - 1) / slices)
      (lo until hi by per).map(s =>
        PagedPartition(s, math.min(s + per, hi)): InputPartition).toArray
    }
  }
}

private[sources] case class PagedOffset(nextPage: Int)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = nextPage.toString
}

/** Page-cursor micro-batch stream: each trigger reads pages
  * [committed, probed-latest) with the same sliced partitions and pruned
  * schema as the batch path; the checkpointed offset is the cursor, so a
  * restart resumes mid-feed without re-fetching consumed pages. */
private[sources] class PagedMicroBatchStream(conf: PagedConf, required: StructType)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream {
  import org.apache.spark.sql.connector.read.streaming.Offset
  override def initialOffset(): Offset = PagedOffset(0)
  override def latestOffset(): Offset = PagedOffset(PagedEndpoint.pageCount(conf))
  override def deserializeOffset(json: String): Offset =
    PagedOffset(Integer.parseInt(json))
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    PagedScan.slice(start.asInstanceOf[PagedOffset].nextPage,
      end.asInstanceOf[PagedOffset].nextPage, conf.slices)
  override def createReaderFactory(): PartitionReaderFactory =
    new PagedReaderFactory(conf, required)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private[sources] class PagedReaderFactory(conf: PagedConf, required: StructType,
                                          limit: Int = Int.MaxValue)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val pp = p.asInstanceOf[PagedPartition]
    new PartitionReader[InternalRow] {
      private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      private var page = pp.pStart
      private var lines: Iterator[String] = Iterator.empty
      private var current: InternalRow = _
      private var emitted = 0

      private def convert(line: String): InternalRow = {
        val node = mapper.readTree(line)
        InternalRow.fromSeq(required.fields.toSeq.map { f =>
          val v = node.get(f.name)
          if (v == null || v.isNull) null
          else f.dataType match {
            case LongType => v.asLong()
            case IntegerType => v.asInt()
            case DoubleType => v.asDouble()
            case BooleanType => v.asBoolean()
            case ArrayType(StringType, _) =>
              val it = v.elements()
              val buf = scala.collection.mutable.ArrayBuffer.empty[Any]
              while (it.hasNext) buf += UTF8String.fromString(it.next().asText())
              new GenericArrayData(buf.toArray)
            case _ => UTF8String.fromString(v.asText())
          }
        })
      }

      override def next(): Boolean = {
        if (emitted >= limit) return false // pushed LIMIT: stop fetching
        while (!lines.hasNext && page < pp.pEnd) {
          lines = PagedEndpoint.fetch(conf.dir, page,
            conf.maxRetries, conf.retryWaitMs).iterator
          page += 1
        }
        if (lines.hasNext) { current = convert(lines.next()); emitted += 1; true }
        else false
      }
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
