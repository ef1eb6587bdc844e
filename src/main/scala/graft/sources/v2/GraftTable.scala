package graft.sources.v2

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning, UnknownPartitioning}
import org.apache.spark.sql.execution.datasources.{FilePartition, InMemoryFileIndex, PartitionedFile}
import org.apache.spark.sql.execution.datasources.v2.parquet.{ParquetPartitionReaderFactory, ParquetScan}
import org.apache.spark.sql.sources.{EqualNullSafe, EqualTo, Filter, In}
import org.apache.spark.sql.types.{DataType, IntegerType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.io.IcebergishTable

/** One Icebergish table exposed through DataSource V2 (see [[GraftCatalog]]).
  *
  * - Schema comes from the current snapshot manifest, not file listing.
  * - `partitioning()` reports the writer's hash-bucket layout as a
  *   `bucket(n, key)` transform → storage-partitioned joins.
  * - Scans prune columns (`SupportsPushDownRequiredColumns`), prune buckets
  *   from part-column predicates, and push data filters into the parquet
  *   reader (row-group stats pruning).
  */
final class GraftTable(ident: String, path: String)
    extends Table with SupportsRead {

  private val (schemaJson, bucketSpec) = IcebergishTable.manifestMeta(path)

  /** Full table schema (data columns + the part column, as written). */
  private val tableSchema: StructType =
    DataType.fromJson(schemaJson).asInstanceOf[StructType]

  private val dataSchema: StructType =
    StructType(tableSchema.filterNot(_.name == IcebergishTable.PartCol))

  override def name(): String = ident
  override def schema(): StructType = tableSchema

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def partitioning(): Array[Transform] = bucketSpec match {
    case Some((key, n)) => Array(Expressions.bucket(n, key))
    case None => Array.empty
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    // Time travel: .option("snapshot", n) pins the scan to that manifest's
    // file list (expired snapshots fail loudly at planning).
    val snapshot = Option(options.get("snapshot")).map(_.toInt)
    new GraftScanBuilder(path, tableSchema, dataSchema, bucketSpec, snapshot)
  }
}

final class GraftScanBuilder(path: String, tableSchema: StructType,
                             dataSchema: StructType,
                             bucketSpec: Option[(String, Int)],
                             snapshot: Option[Int] = None)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters {

  private var requiredSchema: StructType = tableSchema
  private var dataFilters: Array[Filter] = Array.empty
  private var prunedBuckets: Option[Set[Int]] = None

  override def pruneColumns(required: StructType): Unit = {
    // Preserve table column order (parquet factory appends partition cols
    // last); `required` may arrive in arbitrary order.
    val names = required.fieldNames.toSet
    requiredSchema = StructType(tableSchema.filter(f => names.contains(f.name)))
  }

  /** Bucket pruning from part-column predicates is EXACT (directory layout),
    * so those filters are fully consumed; data filters go to the parquet
    * reader for row-group pruning but stay residual (stats pruning is
    * best-effort).
    *
    * A filter only counts as a part filter when its value(s) actually ARE
    * Ints — the part column's storage type. Any other shape (e.g. a Long
    * from an implicit cast by a future caller) stays residual: Spark then
    * evaluates it post-scan, degrading to slow-but-correct instead of the
    * old behavior of consuming it with `Set.empty` and silently pruning
    * every bucket (VERDICT r2 finding #3).
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (partFilters, rest) = filters.partition {
      case EqualTo(c, _: Int) => c == IcebergishTable.PartCol
      case EqualNullSafe(c, _: Int) => c == IcebergishTable.PartCol
      case In(c, vs) =>
        c == IcebergishTable.PartCol && vs.nonEmpty &&
          vs.forall(_.isInstanceOf[Int])
      case _ => false
    }
    if (partFilters.nonEmpty) {
      val keep = partFilters.map {
        case EqualTo(_, v: Int) => Set(v)
        case EqualNullSafe(_, v: Int) => Set(v)
        case In(_, vs) => vs.collect { case v: Int => v }.toSet
        case _ => Set.empty[Int] // unreachable: partition() above is typed
      }.reduce(_ intersect _)
      prunedBuckets = Some(keep)
    }
    dataFilters = rest
    rest
  }

  override def pushedFilters(): Array[Filter] = dataFilters

  override def build(): Scan =
    new GraftScan(path, dataSchema, requiredSchema, bucketSpec,
      prunedBuckets, dataFilters, snapshot)
}

/** A bucket's worth of files, keyed for storage-partitioned joins. */
final case class GraftBucketPartition(bucket: Int,
                                      files: Array[PartitionedFile])
    extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow =
    new GenericInternalRow(Array[Any](bucket))
}

final class GraftScan(path: String, dataSchema: StructType,
                      requiredSchema: StructType,
                      bucketSpec: Option[(String, Int)],
                      prunedBuckets: Option[Set[Int]],
                      dataFilters: Array[Filter],
                      snapshot: Option[Int] = None)
    extends Scan with Batch with SupportsReportPartitioning {

  private val needsPart =
    requiredSchema.fieldNames.contains(IcebergishTable.PartCol)
  private val readDataSchema: StructType =
    StructType(requiredSchema.filterNot(_.name == IcebergishTable.PartCol))
  private val partitionSchema: StructType =
    if (needsPart) StructType(Seq(StructField(IcebergishTable.PartCol,
      IntegerType, nullable = false)))
    else new StructType()

  override def readSchema(): StructType =
    StructType(readDataSchema ++ partitionSchema)

  override def toBatch: Batch = this

  /** One InputPartition per (non-pruned, non-empty) bucket directory.
    * Planned once per scan — `outputPartitioning` and Spark's own
    * `planInputPartitions` call would otherwise re-walk every bucket dir
    * and re-stat every file (and could disagree if files changed between).
    */
  private lazy val plannedPartitions: Array[InputPartition] = planPartitions()

  override def planInputPartitions(): Array[InputPartition] = plannedPartitions

  private def planPartitions(): Array[InputPartition] = {
    val dataDir = java.nio.file.Paths.get(path, "data")
    if (!java.nio.file.Files.isDirectory(dataDir)) return Array.empty
    // Current reads see only LIVE files (compaction tombstones stay on
    // disk for time travel but are not current state); a snapshot-pinned
    // read sees exactly that manifest's file list.
    val root = java.nio.file.Paths.get(path)
    val live: Set[String] = snapshot match {
      case Some(s) =>
        val fs = IcebergishTable.snapshotFiles(path, s)
        if (fs.isEmpty) throw new graft.SnapshotNotFound(path, s)
        fs.toSet
      case None => IcebergishTable.liveDataFiles(path)
    }
    val bucketDirs = {
      val s = java.nio.file.Files.list(dataDir)
      try s.iterator().asScala
        .filter(p => p.getFileName.toString.startsWith(
          IcebergishTable.PartCol + "="))
        .toSeq
      finally s.close()
    }
    bucketDirs
      .map(d => d.getFileName.toString
        .stripPrefix(IcebergishTable.PartCol + "=").toInt -> d)
      .filter { case (b, _) => prunedBuckets.forall(_.contains(b)) }
      .sortBy(_._1)
      .map { case (b, d) =>
        val partValues: InternalRow =
          if (needsPart) new GenericInternalRow(Array[Any](b))
          else InternalRow.empty
        val s = java.nio.file.Files.list(d)
        val files = try s.iterator().asScala
          .filter(_.toString.endsWith(".parquet"))
          .filter(f => live.contains(root.relativize(f).toString))
          .toArray.sortBy(_.toString)
          .map { f =>
            val size = java.nio.file.Files.size(f)
            PartitionedFile(partValues,
              SparkPath.fromPathString(f.toAbsolutePath.toString),
              0L, size, Array.empty,
              java.nio.file.Files.getLastModifiedTime(f).toMillis, size)
          }
        finally s.close()
        GraftBucketPartition(b, files): InputPartition
      }
      .toArray
  }

  override def outputPartitioning(): Partitioning = bucketSpec match {
    case Some((key, n)) =>
      new KeyGroupedPartitioning(Array(Expressions.bucket(n, key)),
        plannedPartitions.length)
    case None => new UnknownPartitioning(plannedPartitions.length)
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    // Delegate to Spark's own ParquetScan for the reader factory: it wires
    // the full hadoopConf contract (ReadSupport class, requested-schema
    // JSON, rebase modes, …) that the factory's readers expect. The file
    // index is empty on purpose — planning stays ours (bucket-grouped
    // partitions above); only the per-file reading machinery is borrowed.
    val session = SparkSession.active
    val hadoopConf = session.sessionState.newHadoopConf()
    val fileIndex = new InMemoryFileIndex(session, Seq.empty, Map.empty, None)
    val inner = ParquetScan(session, hadoopConf, fileIndex, dataSchema,
      readDataSchema, partitionSchema, dataFilters,
      CaseInsensitiveStringMap.empty())
    GraftReaderFactory(inner.createReaderFactory()
      .asInstanceOf[ParquetPartitionReaderFactory])
  }

  override def description(): String =
    s"GraftScan(path=$path, buckets=${prunedBuckets.map(_.toSeq.sorted)
      .getOrElse("all")}, pushed=${dataFilters.mkString(",")})"
}

/** Adapts [[GraftBucketPartition]] to Spark's parquet reader factory (which
  * expects [[FilePartition]]s).
  */
final case class GraftReaderFactory(inner: ParquetPartitionReaderFactory)
    extends PartitionReaderFactory {

  private def asFilePartition(p: InputPartition): FilePartition = p match {
    case GraftBucketPartition(b, files) => FilePartition(b, files)
    case other => throw new IllegalArgumentException(other.toString)
  }

  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    inner.createReader(asFilePartition(p))

  override def createColumnarReader(p: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] =
    inner.createColumnarReader(asFilePartition(p))

  override def supportColumnarReads(p: InputPartition): Boolean =
    inner.supportColumnarReads(asFilePartition(p))
}
