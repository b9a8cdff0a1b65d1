package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Hadoop SequenceFile source/sink carrying Hive-style delimited rows —
  * the reference's default `STORED AS SEQUENCEFILE` layout
  * (ql/io/HiveSequenceFileOutputFormat.java + LazySimpleSerDe rows in
  * the Text value, empty key). Round 1 dropped this as legacy; the
  * Hadoop classes ship with Spark, so the format is supported for real:
  * genuinely interoperable container bytes, distributed read (one task
  * per split — SequenceFile is sync-marker splittable and
  * `sc.sequenceFile` uses the splitting Hadoop InputFormat), and the
  * delimited payload parsed by Spark's codegen'd CSV reader with
  * LazySimpleSerDe conventions (`^A` delimiter, `\N` nulls).
  */
object SequenceFiles {

  val DefaultDelimiter = "\u0001" // LazySimpleSerDe ctrl-A
  val NullSequence = "\\N"

  /** Read SequenceFile[*, Text] whose values are delimited rows. The
    * key is ignored (Hive's sink writes an empty key but other writers
    * use BytesWritable — e.g. the reference's part.seq fixture), so the
    * reader accepts any Writable key class: the SequenceFile header
    * names the real class and the declared `Writable` upper bound never
    * forces a cast. */
  def readDelimited(
      spark: SparkSession,
      path: String,
      schema: StructType,
      delimiter: String = DefaultDelimiter): DataFrame = {
    import org.apache.hadoop.io.{Text, Writable}
    import org.apache.hadoop.mapred.SequenceFileInputFormat
    val values: Dataset[String] = spark.createDataset(
      spark.sparkContext.hadoopFile(path,
          classOf[SequenceFileInputFormat[Writable, Text]],
          classOf[Writable], classOf[Text])
        .map(_._2.toString))(
      Encoders.STRING)
    spark.read
      .schema(schema)
      .option("sep", delimiter)
      .option("nullValue", NullSequence)
      // LazySimpleSerDe rows are unquoted/unescaped (the sink writes
      // values verbatim) — disable the CSV parser's quote handling or a
      // value starting with '"' swallows delimiters
      .option("quote", "\u0000")
      .option("escape", "\u0000")
      .csv(values)
  }

  /** Write the frame as SequenceFile[Text, Text]: empty key, delimited
    * row in the value (Hive's FileSinkOperator layout for
    * SEQUENCEFILE tables). One output file per partition. */
  def writeDelimited(
      df: DataFrame,
      path: String,
      delimiter: String = DefaultDelimiter): Unit = {
    val rendered = df.columns.map(c =>
      coalesce(col(c).cast("string"), lit(NullSequence)))
    val lines = df.select(concat_ws(delimiter, rendered: _*).as("line"))
      .as[String](Encoders.STRING)
    lines.rdd.map(l => ("", l)).saveAsSequenceFile(path)
  }
}
