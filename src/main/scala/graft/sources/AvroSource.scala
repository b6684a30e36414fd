package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro external tables (SURVEY §2.2: the reference reads
  * `STORED AS AVRO` through DataFusion, lib.rs:678).
  *
  * `/opt/spark/jars` ships Avro CORE (avro/avro-ipc/avro-mapred 1.12.1,
  * used by Spark's own serializers) but NOT the `spark-avro` connector —
  * `USING avro` fails with "Failed to find data source: avro"
  * (evidence in STATUS.md). Rather than documenting the capability away,
  * this source implements the container-file format directly on the core
  * library:
  *
  *  - [[write]]: one Avro container file per partition, written through
  *    the Hadoop FileSystem API on the executors (file:/ here; the same
  *    code path reaches s3a:/gs:/ through whatever FS conf the cluster
  *    ships) — fully distributed, no driver funnel.
  *  - [[read]]: file list → one partition per container file → streamed
  *    decode on executors. The Avro writer schema is read once from the
  *    first container's header on the driver and mapped to a StructType.
  *
  * Type surface: the Avro primitives (boolean/int/long/float/double/
  * string/bytes) plus nullable unions — the columns an external Avro
  * table exchange format actually uses. Nested records would map onto
  * StructType recursively; out of scope until a probe needs them.
  */
object AvroSource {

  /** StructType → Avro record schema (nullable fields as [null, T]). */
  def avroSchema(st: StructType): Schema = {
    val fields = new java.util.ArrayList[Schema.Field]()
    st.fields.foreach { f =>
      val base = f.dataType match {
        case BooleanType => Schema.create(Schema.Type.BOOLEAN)
        case IntegerType => Schema.create(Schema.Type.INT)
        case LongType    => Schema.create(Schema.Type.LONG)
        case FloatType   => Schema.create(Schema.Type.FLOAT)
        case DoubleType  => Schema.create(Schema.Type.DOUBLE)
        case StringType  => Schema.create(Schema.Type.STRING)
        case BinaryType  => Schema.create(Schema.Type.BYTES)
        case other => throw new IllegalArgumentException(
          s"unsupported Avro column type: $other")
      }
      if (f.nullable) {
        val union = Schema.createUnion(java.util.Arrays.asList(
          Schema.create(Schema.Type.NULL), base))
        fields.add(new Schema.Field(f.name, union, null,
          Schema.Field.NULL_DEFAULT_VALUE))
      } else {
        fields.add(new Schema.Field(f.name, base, null,
          null.asInstanceOf[Object]))
      }
    }
    Schema.createRecord("row", null, "graft.avro", false, fields)
  }

  /** Avro record schema → StructType (unions with null → nullable). */
  def structType(schema: Schema): StructType = {
    require(schema.getType == Schema.Type.RECORD,
      s"expected a record schema, got ${schema.getType}")
    StructType(schema.getFields.asScala.toSeq.map { f =>
      val (s, nullable) =
        if (f.schema().getType == Schema.Type.UNION) {
          val nonNull = f.schema().getTypes.asScala
            .filter(_.getType != Schema.Type.NULL)
          require(nonNull.size == 1, s"unsupported union: ${f.schema()}")
          (nonNull.head, true)
        } else (f.schema(), false)
      val dt = s.getType match {
        case Schema.Type.BOOLEAN => BooleanType
        case Schema.Type.INT     => IntegerType
        case Schema.Type.LONG    => LongType
        case Schema.Type.FLOAT   => FloatType
        case Schema.Type.DOUBLE  => DoubleType
        case Schema.Type.STRING  => StringType
        case Schema.Type.BYTES   => BinaryType
        case other => throw new IllegalArgumentException(
          s"unsupported Avro field type: $other")
      }
      StructField(f.name(), dt, nullable)
    })
  }

  /** The session's Hadoop conf flattened to a plain serializable map so
    * executors rebuild it — `new Configuration()` on an executor would
    * drop the env-driven s3a/gs credentials [[graft.engine.ObjectStoreConf]]
    * installed on the driver. */
  private def confMap(df: DataFrame): Map[String, String] = {
    import scala.jdk.CollectionConverters._
    df.sparkSession.sparkContext.hadoopConfiguration.asScala
      .map(e => e.getKey -> e.getValue).toMap
  }

  private def rebuild(entries: Map[String, String]): Configuration = {
    val c = new Configuration(false)
    entries.foreach { case (k, v) => c.set(k, v) }
    c
  }

  /** Write `df` as Avro container files under `path`, one file per
    * partition, each written on its executor. */
  def write(df: DataFrame, path: String): Unit = {
    val st = df.schema
    val schemaJson = avroSchema(st).toString // Schema isn't serializable
    val width = st.length
    val dir = new Path(path)
    val entries = confMap(df)
    dir.getFileSystem(rebuild(entries)).mkdirs(dir)
    df.rdd.foreachPartition { rows =>
      val schema = new Schema.Parser().parse(schemaJson)
      val idx = TaskContext.getPartitionId()
      val p = new Path(path, f"part-$idx%05d.avro")
      val out = p.getFileSystem(rebuild(entries)).create(p, true)
      val writer =
        new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
      writer.create(schema, out)
      try rows.foreach { row =>
        val rec = new GenericData.Record(schema)
        var i = 0
        while (i < width) {
          rec.put(i, row.get(i) match {
            case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
            case v => v // null + boxed primitives + String pass through
          })
          i += 1
        }
        writer.append(rec)
      } finally writer.close()
    }
  }

  /** Read the Avro container files under `path` as a DataFrame; one scan
    * partition per file. */
  def read(spark: SparkSession, path: String): DataFrame = {
    import scala.jdk.CollectionConverters._
    val entries = spark.sparkContext.hadoopConfiguration.asScala
      .map(e => e.getKey -> e.getValue).toMap
    val conf = rebuild(entries)
    val dir = new Path(path)
    val fs = dir.getFileSystem(conf)
    val files = fs.listStatus(dir).map(_.getPath)
      .filter(_.getName.endsWith(".avro")).map(_.toString).sorted.toSeq
    require(files.nonEmpty, s"no .avro files under $path")
    val header = new DataFileReader(new FsInput(new Path(files.head), conf),
      new GenericDatumReader[GenericRecord]())
    val writerSchema = try header.getSchema finally header.close()
    val st = structType(writerSchema)
    val width = st.length
    val rdd = spark.sparkContext
      .parallelize(files, files.length)
      .flatMap { f =>
        val reader = new DataFileReader(
          new FsInput(new Path(f), rebuild(entries)),
          new GenericDatumReader[GenericRecord]())
        val it = reader.iterator.asScala.map { rec =>
          Row.fromSeq((0 until width).map { i =>
            rec.get(i) match {
              case u: org.apache.avro.util.Utf8 => u.toString
              case bb: java.nio.ByteBuffer =>
                val a = new Array[Byte](bb.remaining())
                bb.duplicate().get(a)
                a
              case v => v
            }
          })
        }
        // close the container once the partition is fully consumed
        new Iterator[Row] {
          def hasNext: Boolean = {
            val h = it.hasNext
            if (!h) reader.close()
            h
          }
          def next(): Row = it.next()
        }
      }
    spark.createDataFrame(rdd, st)
  }
}
