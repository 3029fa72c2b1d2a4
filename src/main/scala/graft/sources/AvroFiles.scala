package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Avro container-file source/sink built DIRECTLY on avro-core — the
  * `spark-avro` module is an external jar this environment does not
  * ship, so §2.2's Avro row stays honest through Spark's sanctioned
  * extension point instead: a DataSource V2 `TableProvider` (registered
  * as `graft-avro`) whose read path infers the table schema by MERGING
  * every file's embedded writer schema by field name (the parquet
  * `mergeSchema` discipline — a file missing an evolved column reads it
  * as NULL), prunes columns via `SupportsPushDownRequiredColumns`
  * (decode maps only requested fields; the scan's ReadSchema shrinks,
  * plan-pinned in FormatsSpec), and parallelizes one `InputPartition`
  * per file. The write path builds the avro schema from the DataFrame
  * schema and writes one container file per Spark partition on the
  * executors — data never driver-side.
  *
  * Type subset (the fixture surface): BOOLEAN, INT, LONG, FLOAT,
  * DOUBLE, STRING, BYTES, each nullable via the idiomatic
  * UNION(null, T). 100 TB note: parallelism is file-granular (like
  * `binaryFile`); the upgrade path is block-level splits on the avro
  * sync markers, which changes only `planInputPartitions`.
  *
  * Reference semantics: interchange-format ingestion breadth
  * (README.md:18-22's map phase reads arbitrary serialized inputs). */
object AvroFiles {

  private[sources] def avroToSpark(s: Schema): DataType = s.getType match {
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.INT     => IntegerType
    case Schema.Type.LONG    => LongType
    case Schema.Type.FLOAT   => FloatType
    case Schema.Type.DOUBLE  => DoubleType
    case Schema.Type.STRING  => StringType
    case Schema.Type.BYTES   => BinaryType
    case Schema.Type.UNION =>
      val branches = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
      require(branches.size == 1, s"unsupported union $s")
      avroToSpark(branches.head)
    case t => throw new IllegalArgumentException(s"unsupported avro type $t")
  }

  private[sources] def sparkToAvro(dt: DataType, name: String): Schema = {
    val base = dt match {
      case BooleanType => Schema.create(Schema.Type.BOOLEAN)
      case IntegerType => Schema.create(Schema.Type.INT)
      case LongType    => Schema.create(Schema.Type.LONG)
      case FloatType   => Schema.create(Schema.Type.FLOAT)
      case DoubleType  => Schema.create(Schema.Type.DOUBLE)
      case StringType  => Schema.create(Schema.Type.STRING)
      case BinaryType  => Schema.create(Schema.Type.BYTES)
      case t => throw new IllegalArgumentException(s"unsupported spark type $t")
    }
    Schema.createUnion(java.util.List.of(
      Schema.create(Schema.Type.NULL), base))
  }

  private[sources] def recordSchema(st: StructType): Schema = {
    val fields = st.fields.map { f =>
      new Schema.Field(f.name, sparkToAvro(f.dataType, f.name),
        null, Schema.Field.NULL_DEFAULT_VALUE)
    }
    Schema.createRecord("graft_avro", null, "graft", false,
      java.util.List.of(fields: _*))
  }

  private def listAvroFiles(spark: org.apache.spark.sql.SparkSession,
                            dir: String): Seq[String] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) return Seq.empty
    fs.listStatus(p).toSeq.map(_.getPath)
      .filter(_.getName.endsWith(".avro")).map(_.toString).sorted
  }

  private def fileSchema(spark: org.apache.spark.sql.SparkSession,
                         file: String): Schema = {
    val conf = spark.sessionState.newHadoopConf()
    val in = new FsInput(new Path(file), conf)
    val r = new DataFileReader[GenericRecord](in,
      new GenericDatumReader[GenericRecord]())
    try r.getSchema finally { r.close(); in.close() }
  }

  /** Merge every file's writer schema by FIELD NAME into the table
    * schema (all columns nullable — an absent field reads as NULL).
    * Conflicting types for one name are an error, not a coercion. */
  def inferSchema(spark: org.apache.spark.sql.SparkSession,
                  dir: String): StructType = {
    val files = listAvroFiles(spark, dir)
    require(files.nonEmpty, s"no .avro files under $dir")
    val fields = scala.collection.mutable.LinkedHashMap.empty[String, DataType]
    for (f <- files; fld <- fileSchema(spark, f).getFields.asScala) {
      val dt = avroToSpark(fld.schema())
      fields.get(fld.name()) match {
        case Some(prev) =>
          require(prev == dt,
            s"avro schema conflict on '${fld.name()}': $prev vs $dt")
        case None => fields += fld.name() -> dt
      }
    }
    StructType(fields.toSeq.map { case (n, t) => StructField(n, t, true) })
  }

  /** The session Hadoop conf flattened for executor-side rebuild —
    * a bare `new Configuration()` on the executor would drop every
    * spark.hadoop.* setting (credentials, filesystem impls) the driver
    * resolved (ADVICE r10). */
  private def confPairs(spark: org.apache.spark.sql.SparkSession)
      : Array[(String, String)] = {
    val c = spark.sessionState.newHadoopConf()
    c.iterator().asScala.map(e => (e.getKey, e.getValue)).toArray
  }

  private[sources] def rebuildConf(pairs: Array[(String, String)])
      : org.apache.hadoop.conf.Configuration = {
    val c = new org.apache.hadoop.conf.Configuration(false)
    pairs.foreach { case (k, v) => c.set(k, v) }
    c
  }

  /** Distributed write: one avro container file per Spark partition,
    * written on the executors through the session's Hadoop FileSystem.
    *
    * Task-commit discipline (ADVICE r10): each task writes to a
    * dot-prefixed `.inprogress` temp name (excluded by the reader's
    * `*.avro` filter) and renames into place only on success. The
    * final name is deterministic per (write call, partition) — a
    * retried or speculative attempt renames onto the SAME target, so
    * exactly one complete file survives and a failed attempt's partial
    * file is never visible to readers (stale `.inprogress` files are
    * reclaimable garbage, not data). */
  def write(df: DataFrame, dir: String): Unit = {
    val st = df.schema
    val schemaJson = recordSchema(st).toString
    val n = df.schema.fields.length
    // one id per WRITE CALL: distinguishes append generations while
    // letting same-job attempts collapse onto one target name
    val jobId = java.util.UUID.randomUUID().toString.take(8)
    val pairs = confPairs(df.sparkSession)
    df.queryExecution.toRdd.foreachPartition { (it: Iterator[InternalRow]) =>
      if (it.hasNext) {
        val tc = org.apache.spark.TaskContext.get()
        val pid = tc.partitionId()
        val schema = new Schema.Parser().parse(schemaJson)
        val target = new Path(dir, f"part-$pid%05d-$jobId.avro")
        val tmp = new Path(dir,
          f".part-$pid%05d-$jobId.avro.attempt-${tc.taskAttemptId()}.inprogress")
        val fs = target.getFileSystem(rebuildConf(pairs))
        val out = fs.create(tmp, true)
        val w = new DataFileWriter[GenericRecord](
          new GenericDatumWriter[GenericRecord](schema))
        w.create(schema, out)
        var committed = false
        try {
          for (row <- it) {
            val rec = new GenericData.Record(schema)
            var i = 0
            while (i < n) {
              val v: AnyRef =
                if (row.isNullAt(i)) null
                else st.fields(i).dataType match {
                  case BooleanType => java.lang.Boolean.valueOf(row.getBoolean(i))
                  case IntegerType => java.lang.Integer.valueOf(row.getInt(i))
                  case LongType    => java.lang.Long.valueOf(row.getLong(i))
                  case FloatType   => java.lang.Float.valueOf(row.getFloat(i))
                  case DoubleType  => java.lang.Double.valueOf(row.getDouble(i))
                  case StringType  => row.getUTF8String(i).toString
                  case BinaryType  => java.nio.ByteBuffer.wrap(row.getBinary(i))
                  case t => throw new IllegalArgumentException(s"$t")
                }
              rec.put(st.fields(i).name, v)
              i += 1
            }
            w.append(rec)
          }
          w.close()
          // commit: FIRST successful attempt wins the deterministic
          // name. Never delete-then-rename (ADVICE r10): with
          // speculative execution a losing attempt could delete the
          // winner's committed file and be killed before its own
          // rename, leaving the partition's output missing while the
          // job reports success. Attempts write identical content
          // (same partition iterator), so an existing target IS the
          // committed output — drop our tmp and report success.
          if (!fs.rename(tmp, target)) {
            if (fs.exists(target)) fs.delete(tmp, false)
            else throw new java.io.IOException(
              s"avro commit failed: $tmp -> $target")
          }
          committed = true
        } finally {
          if (!committed) { try w.close() catch { case _: Throwable => () } }
        }
      }
    }
  }
}

/** The `graft-avro` DataSource V2 provider. */
class AvroSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-avro"

  private def path(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null, "graft-avro requires a path")
    p
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val spark = org.apache.spark.sql.SparkSession.active
    AvroFiles.inferSchema(spark, path(options))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table = {
    val spark = org.apache.spark.sql.SparkSession.active
    val p = properties.get("path")
    require(p != null, "graft-avro requires a path")
    new AvroTable(p, schema, spark)
  }
}

private[sources] class AvroTable(dir: String, schema: StructType,
                                 spark: org.apache.spark.sql.SparkSession)
    extends Table with SupportsRead {
  override def name(): String = s"graft-avro:$dir"
  override def schema(): StructType = schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.Set.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new AvroScanBuilder(dir, schema, spark)
}

/** Column pruning only — NO filter pushdown (deliberate): Avro is a
  * row-major container with no row-group statistics, so a pushed
  * predicate could never skip I/O the way parquet min/max pruning
  * does; it would only move the same per-row evaluation from Spark's
  * codegen'd filter (where it vectorizes) into the reader loop.
  * Pruned columns DO pay: the decoder skips unprojected fields
  * without materializing them. */
private[sources] class AvroScanBuilder(dir: String, full: StructType,
                                       spark: org.apache.spark.sql.SparkSession)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = full
  override def pruneColumns(requiredSchema: StructType): Unit = {
    // preserve the table's field order; decode maps only these fields
    val keep = requiredSchema.fieldNames.toSet
    required = StructType(full.fields.filter(f => keep(f.name)))
  }
  override def build(): Scan = new AvroScan(dir, required, spark)
}

private[sources] case class AvroFilePartition(file: String)
    extends InputPartition

private[sources] class AvroScan(dir: String, required: StructType,
                                spark: org.apache.spark.sql.SparkSession)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.listStatus(p).map(_.getPath)
      .filter(_.getName.endsWith(".avro")).map(_.toString).sorted
      .map(AvroFilePartition(_): InputPartition)
  }
  override def createReaderFactory(): PartitionReaderFactory = {
    // ship the SESSION Hadoop conf: executors rebuilding a bare default
    // Configuration would lose spark.hadoop.* settings (ADVICE r10)
    val pairs = spark.sessionState.newHadoopConf()
      .iterator().asScala.map(e => (e.getKey, e.getValue)).toArray
    new AvroReaderFactory(required.json, pairs)
  }
}

private[sources] class AvroReaderFactory(requiredJson: String,
                                         confPairs: Array[(String, String)])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val required = DataType.fromJson(requiredJson).asInstanceOf[StructType]
    val file = partition.asInstanceOf[AvroFilePartition].file
    new AvroPartitionReader(file, required, confPairs)
  }
}

private[sources] class AvroPartitionReader(file: String, required: StructType,
                                           confPairs: Array[(String, String)])
    extends PartitionReader[InternalRow] {
  private val in = new FsInput(new Path(file),
    AvroFiles.rebuildConf(confPairs))
  private val reader = new DataFileReader[GenericRecord](in,
    new GenericDatumReader[GenericRecord]())
  // field-name resolution against THIS file's writer schema: an evolved
  // column absent here reads as NULL (the mergeSchema contract)
  private val writerFields =
    reader.getSchema.getFields.asScala.map(_.name()).toSet

  override def next(): Boolean = reader.hasNext
  override def get(): InternalRow = {
    val rec = reader.next()
    val vals = required.fields.map { f =>
      if (!writerFields(f.name)) null
      else {
        val v = rec.get(f.name)
        if (v == null) null
        else f.dataType match {
          case StringType => UTF8String.fromString(v.toString)
          case BinaryType =>
            val bb = v.asInstanceOf[java.nio.ByteBuffer]
            val arr = new Array[Byte](bb.remaining()); bb.duplicate().get(arr); arr
          case _ => v
        }
      }
    }
    InternalRow.fromSeq(vals.toSeq)
  }
  override def close(): Unit = { reader.close(); in.close() }
}
