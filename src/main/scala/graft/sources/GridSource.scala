package graft.sources

import java.util
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Custom DataSource V2: a deterministic synthetic light-curve GRID
  * generator as a first-class batch source — the reference's
  * simulation stage (ref main.py T14 injection model) exposed the way
  * a production system would expose any external system: through the
  * connector API, so Catalyst sees a real table with pushdown instead
  * of an opaque RDD. Completes the extension ladder (§2.11): codegen
  * `Expression` → typed `Aggregator` → group kernels → whole-operator
  * `LogicalPlan`+`Strategy`+`SparkPlan` (AsOfJoin) → **TableProvider**.
  *
  * Scale design, the part that matters at 100 TB:
  *  - one `InputPartition` per grid chunk — generation parallelizes
  *    across executors with no driver materialization and no shuffle;
  *  - `SupportsPushDownFilters` accepts `chunk` predicates and prunes
  *    WHOLE PARTITIONS at planning time (the source-side analog of
  *    parquet partition pruning: a pushed `chunk >= k` means the
  *    pruned chunks are never even scheduled);
  *  - `SupportsPushDownRequiredColumns` prunes generation per column —
  *    an unprojected column is never computed.
  *
  * Values are closed-form in the global row index (LCG at 1e6), so a
  * SQL oracle replays the whole table with generate_series and the
  * usual exact-integer aggregates.
  */
class GridSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GridSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new GridTable(
      properties.getOrDefault("chunks", "64").toInt,
      properties.getOrDefault("rows_per_chunk", "4096").toInt)
}

object GridSource {
  val schema: StructType = StructType(Seq(
    StructField("chunk", LongType, nullable = false),
    StructField("t_us", LongType, nullable = false),
    StructField("flux", DoubleType, nullable = false)))

  val T0 = 1704067200000000L // 2024-01-01T00:00Z, micros
  val DT = 120000000L        // 2-minute cadence

  /** flux microunits for global row index g: LCG residue centered on 0. */
  def flux6(g: Long): Long = (g * 2654435761L) % 2048L - 1024L
}

private class GridTable(chunks: Int, rowsPerChunk: Int)
    extends Table with SupportsRead {
  override def name(): String = s"graft_grid($chunks x $rowsPerChunk)"
  override def schema(): StructType = GridSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GridScanBuilder(chunks, rowsPerChunk)
}

private class GridScanBuilder(chunks: Int, rowsPerChunk: Int)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {
  private var required: StructType = GridSource.schema
  private var lo = 0L                 // inclusive chunk bound
  private var hi = chunks.toLong - 1  // inclusive chunk bound
  private var accepted: Array[Filter] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // literals arrive boxed; chunk is LongType but match any integral
    val (ours, rest) = filters.partition {
      case EqualTo("chunk", _: Number) | GreaterThan("chunk", _: Number) |
           GreaterThanOrEqual("chunk", _: Number) | LessThan("chunk", _: Number) |
           LessThanOrEqual("chunk", _: Number) => true
      case _ => false
    }
    ours.foreach {
      case EqualTo("chunk", v: Number) =>
        lo = lo.max(v.longValue); hi = hi.min(v.longValue)
      case GreaterThan("chunk", v: Number)        => lo = lo.max(v.longValue + 1)
      case GreaterThanOrEqual("chunk", v: Number) => lo = lo.max(v.longValue)
      case LessThan("chunk", v: Number)           => hi = hi.min(v.longValue - 1)
      case LessThanOrEqual("chunk", v: Number)    => hi = hi.min(v.longValue)
      case _                                      => ()
    }
    accepted = ours
    rest // residual filters Spark must still apply
  }
  override def pushedFilters(): Array[Filter] = accepted

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new GridScan(rowsPerChunk, lo, hi, required)
}

private class GridScan(rowsPerChunk: Int, lo: Long, hi: Long,
                       required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft_grid chunks [$lo, $hi], cols ${required.fieldNames.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] =
    (lo to hi).map(c => GridPartition(c, rowsPerChunk): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new GridReaderFactory(required)
}

private case class GridPartition(chunk: Long, n: Int) extends InputPartition

private class GridReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val gp = p.asInstanceOf[GridPartition]
    // resolve the projection ONCE per partition, not per row
    val cols: Array[Long => Any] = required.fieldNames.map {
      case "chunk" => (_: Long) => gp.chunk
      case "t_us"  => (g: Long) => GridSource.T0 + g * GridSource.DT
      case "flux"  => (g: Long) => GridSource.flux6(g).toDouble / 1e6
    }
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < gp.n }
      override def get(): InternalRow = {
        val g = gp.chunk * gp.n + i
        InternalRow.fromSeq(cols.toSeq.map(f => f(g)))
      }
      override def close(): Unit = ()
    }
  }
}
