package graft.sources

import java.io.File
import java.nio.ByteBuffer

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericDatumReader, GenericDatumWriter, GenericRecord, GenericRecordBuilder}
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro container-file source/sink built directly on the avro core
  * library that ships with Spark (`/opt/spark/jars/avro-*.jar`) — the
  * spark-avro DataSource module is absent in this environment, so the
  * format support the reference provides via AvroSerDe
  * (serde/src/java/org/apache/hadoop/hive/serde2/avro/AvroSerDe.java,
  * AvroDeserializer.java) is re-expressed as a distributed
  * parallelize-over-files read and a per-partition DataFileWriter sink.
  *
  * Scope matches the serde's core mapping: records of primitives,
  * strings, bytes, and arrays thereof, with nullable `[null, T]` unions.
  * Scale note: parallelism is per container file (one task per file,
  * capped at the default parallelism); Avro's intra-file sync-marker
  * splitting is intentionally not re-implemented — large datasets are
  * written as many part files by this sink and every other writer.
  */
object Avro {

  /** Avro record schema → Spark schema (nullable via [null, T] unions). */
  def toStructType(s: Schema): StructType = {
    require(s.getType == Schema.Type.RECORD, s"not a record schema: $s")
    StructType(s.getFields.asScala.map { f =>
      val (t, nullable) = fieldType(f.schema())
      StructField(f.name, t, nullable)
    }.toSeq)
  }

  private def fieldType(s: Schema): (DataType, Boolean) = s.getType match {
    case Schema.Type.UNION =>
      val nonNull = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
      require(nonNull.size == 1, s"only [null, T] unions are supported: $s")
      (fieldType(nonNull.head)._1, true)
    case Schema.Type.INT     => (IntegerType, false)
    case Schema.Type.LONG    => (LongType, false)
    case Schema.Type.FLOAT   => (FloatType, false)
    case Schema.Type.DOUBLE  => (DoubleType, false)
    case Schema.Type.BOOLEAN => (BooleanType, false)
    case Schema.Type.STRING  => (StringType, false)
    case Schema.Type.BYTES   =>
      // AvroSerDe maps the decimal logical type (bytes carrying the
      // big-endian unscaled value) to DECIMAL(p,s) — ref serde avro
      // AvroDeserializer (HIVE-7174 Avro 1.7 era reads the props from
      // the schema JSON rather than LogicalTypes)
      (Option(s.getObjectProp("logicalType")) match {
        case Some("decimal") =>
          val p = s.getObjectProp("precision").asInstanceOf[Number].intValue
          val sc = Option(s.getObjectProp("scale"))
            .map(_.asInstanceOf[Number].intValue).getOrElse(0)
          DecimalType(p, sc)
        case _ => BinaryType
      }, false)
    case Schema.Type.ARRAY =>
      val (et, en) = fieldType(s.getElementType)
      (ArrayType(et, en), false)
    case Schema.Type.MAP =>
      val (vt, vn) = fieldType(s.getValueType)
      (MapType(StringType, vt, vn), false)
    case Schema.Type.RECORD => (toStructType(s), false)
    case Schema.Type.ENUM => (StringType, false)
    case Schema.Type.FIXED => (BinaryType, false)
    case other =>
      throw new IllegalArgumentException(s"unsupported avro type: $other")
  }

  /** Spark schema → Avro record schema. */
  def toAvroSchema(st: StructType, name: String = "graft_record"): Schema = {
    def base(dt: DataType): Schema = dt match {
      case IntegerType => Schema.create(Schema.Type.INT)
      case LongType    => Schema.create(Schema.Type.LONG)
      case FloatType   => Schema.create(Schema.Type.FLOAT)
      case DoubleType  => Schema.create(Schema.Type.DOUBLE)
      case BooleanType => Schema.create(Schema.Type.BOOLEAN)
      case StringType  => Schema.create(Schema.Type.STRING)
      case BinaryType  => Schema.create(Schema.Type.BYTES)
      case ArrayType(et, _) => Schema.createArray(base(et))
      case other =>
        throw new IllegalArgumentException(s"unsupported spark type: $other")
    }
    val fields = st.fields.map { f =>
      if (f.nullable)
        new Schema.Field(f.name,
          Schema.createUnion(Schema.create(Schema.Type.NULL), base(f.dataType)),
          null, Schema.Field.NULL_DEFAULT_VALUE)
      else new Schema.Field(f.name, base(f.dataType), null, null)
    }
    Schema.createRecord(name, null, "graft", false, fields.toList.asJava)
  }

  private def fromAvro(v: Any): Any = v match {
    case null => null
    case u: org.apache.avro.util.Utf8 => u.toString
    case s: CharSequence => s.toString
    case b: ByteBuffer =>
      val a = new Array[Byte](b.remaining()); b.duplicate().get(a); a
    case l: java.util.List[_] => l.asScala.map(fromAvro).toSeq
    case x => x
  }

  /** Type-directed variant: decodes decimal-logical bytes into
    * java.math.BigDecimal for DecimalType targets. */
  private def fromAvroAs(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (b: ByteBuffer, d: DecimalType) =>
      val a = new Array[Byte](b.remaining()); b.duplicate().get(a)
      new java.math.BigDecimal(new java.math.BigInteger(a), d.scale)
    case (a: Array[Byte], d: DecimalType) =>
      new java.math.BigDecimal(new java.math.BigInteger(a), d.scale)
    case _ => fromAvro(v)
  }

  private def toAvro(v: Any): Any = v match {
    case null => null
    case b: Array[Byte] => ByteBuffer.wrap(b)
    case s: scala.collection.Seq[_] => s.map(toAvro).asJava
    case x => x
  }

  /** Read a directory of (or a single) .avro container file(s). Schema is
    * taken from the first file; one task per file. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val files = listFiles(path)
    require(files.nonEmpty, s"no .avro files under $path")
    val struct = toStructType(openSchema(files.head))
    // resolve by field NAME, not position: part files written by different
    // jobs may order fields differently under the same logical schema
    val names = struct.fieldNames
    val parallelism = math.min(files.size, spark.sparkContext.defaultParallelism)
    val rows = spark.sparkContext.parallelize(files, parallelism).flatMap { f =>
      val reader = new DataFileReader[GenericRecord](
        new File(f), new GenericDatumReader[GenericRecord]())
      // close on task completion, not only on iterator exhaustion — a
      // limit/take abandons the iterator and would leak the file handle
      Option(TaskContext.get()).foreach(
        _.addTaskCompletionListener[Unit](_ => reader.close()))
      val it = reader.iterator()
      new Iterator[Row] {
        def hasNext: Boolean = it.hasNext
        def next(): Row = {
          val rec = it.next()
          Row.fromSeq(struct.fields.toIndexedSeq.map(f =>
            fromAvroAs(rec.get(f.name), f.dataType)))
        }
      }
    }
    spark.createDataFrame(rows, struct)
  }

  /** Write the frame as one .avro container file per non-empty partition. */
  def write(df: DataFrame, path: String): Unit = {
    val schemaJson = toAvroSchema(df.schema).toString
    val names = df.schema.fieldNames
    new File(path).mkdirs()
    df.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.hasNext) {
        val schema = new Schema.Parser().parse(schemaJson)
        val pid = TaskContext.get().partitionId()
        val w = new DataFileWriter[GenericRecord](
          new GenericDatumWriter[GenericRecord](schema))
        w.create(schema, new File(path, f"part-$pid%05d.avro"))
        try rows.foreach { r =>
          val b = new GenericRecordBuilder(schema)
          names.indices.foreach(i => b.set(names(i), toAvro(r.get(i))))
          w.append(b.build())
        } finally w.close()
      }
    }
  }

  private def listFiles(path: String): Seq[String] = {
    val f = new File(path)
    if (f.isFile) Seq(f.getPath)
    else Option(f.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".avro")).map(_.getPath).sorted.toSeq
  }

  private def openSchema(file: String): Schema = {
    val r = new DataFileReader[GenericRecord](
      new File(file), new GenericDatumReader[GenericRecord]())
    try r.getSchema finally r.close()
  }
}
