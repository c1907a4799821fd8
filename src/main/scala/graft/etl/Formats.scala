package graft.etl

import org.apache.spark.sql.{DataFrame, DataFrameReader, SaveMode, SparkSession}

/** Format-dispatch readers/writers — the reference ETL engine's
  * extension-based `_load_data`/`_save_data`
  * (/root/reference/src/etl.py:121-176) as Spark sources/sinks.
  *
  * CSV "chunking" is implicit in partitioning; every reader/writer is a
  * distributed scan/sink, never a driver-side materialization.
  */
object Formats {

  sealed trait Fmt { def name: String }
  case object Csv extends Fmt { val name = "csv" }
  case object Json extends Fmt { val name = "json" }
  case object Xml extends Fmt { val name = "xml" }
  case object Parquet extends Fmt { val name = "parquet" }
  case object Text extends Fmt { val name = "text" }
  case object Excel extends Fmt { val name = "xlsx" }
  case object Orc extends Fmt { val name = "orc" }

  /** Extension → format, mirroring the reference's suffix dispatch. */
  def ofPath(path: String): Fmt =
    ext(path) match {
      case "csv" | "tsv" => Csv
      case "json" | "jsonl" | "ndjson" => Json
      case "xml" => Xml
      case "parquet" | "pq" => Parquet
      case "txt" | "log" => Text
      case "xlsx" => Excel
      case "orc" => Orc
      case "avro" => throw new UnsupportedOperationException(
        "avro needs the spark-avro datasource jar, which this build " +
          "does not ship; use parquet or orc")
      case "xls" => throw new UnsupportedOperationException(
        "legacy .xls (OLE2 binary) is not supported; convert to .xlsx or CSV")
      case other => throw new IllegalArgumentException(s"Unsupported format: .$other")
    }

  private def ext(path: String): String =
    path.reverse.takeWhile(_ != '.').reverse.toLowerCase

  /** Line-delimited by NAME: .jsonl/.ndjson must never default to
    * multiLine (which keeps only the first record per file).
    */
  private def isJsonLinesExt(path: String): Boolean =
    Seq("jsonl", "ndjson").contains(ext(path))

  /** Read with sensible defaults per format; `options` pass through like
    * the reference's `csv_options`/`json_options`.
    */
  def read(
      spark: SparkSession,
      path: String,
      fmt: Option[Fmt] = None,
      options: Map[String, String] = Map.empty): DataFrame = {
    def r: DataFrameReader = spark.read.options(options)
    fmt.getOrElse(ofPath(path)) match {
      case Csv =>
        r.option("header", options.getOrElse("header", "true"))
          .option("inferSchema", options.getOrElse("inferSchema", "true"))
          // .tsv means tab-separated — the comma default would parse
          // every line into one garbage column
          .option("sep", options.getOrElse("sep", if (ext(path) == "tsv") "\t" else ","))
          .csv(path)
      case Json =>
        // multiLine default by shape: a Spark-written sink (directory of
        // part files) is JSON-LINES — multiLine=true would silently keep
        // only the FIRST object of each part file; a standalone .json
        // file is document-style (tool outputs, API dumps). Callers can
        // always override via options. The check goes through the Hadoop
        // FileSystem so hdfs:// and s3a:// sinks are detected too, not
        // just file://.
        val sparkSink = try {
          val hPath = new org.apache.hadoop.fs.Path(path)
          val fs = hPath.getFileSystem(spark.sessionState.newHadoopConf())
          fs.isDirectory(hPath) &&
            fs.listStatus(hPath).exists(_.getPath.getName.startsWith("part-"))
        } catch { case _: Exception => false }
        val defaultMulti = if (sparkSink || isJsonLinesExt(path)) "false" else "true"
        r.option("multiLine", options.getOrElse("multiLine", defaultMulti)).json(path)
      case Xml => r.format("xml").option("rowTag", options.getOrElse("rowTag", "row")).load(path)
      case Parquet => r.parquet(path)
      case Orc => r.orc(path)
      case Text => r.text(path)
      case Excel =>
        // dependency-free StAX-based reader (see graft.etl.Xlsx) —
        // driver-side parse of the non-splittable zip, distributed frame out
        Xlsx.read(spark, path, header = options.getOrElse("header", "true").toBoolean)
    }
  }

  def write(
      df: DataFrame,
      path: String,
      fmt: Option[Fmt] = None,
      mode: SaveMode = SaveMode.Overwrite,
      options: Map[String, String] = Map.empty): Unit = {
    val w = df.write.mode(mode).options(options)
    fmt.getOrElse(ofPath(path)) match {
      case Csv => w.option("header", options.getOrElse("header", "true"))
        .option("sep", options.getOrElse("sep", if (ext(path) == "tsv") "\t" else ","))
        .csv(path)
      case Json => w.json(path)
      case Xml => w.format("xml").option("rootTag", options.getOrElse("rootTag", "rows"))
        .option("rowTag", options.getOrElse("rowTag", "row")).save(path)
      case Parquet => w.parquet(path)
      case Orc => w.orc(path)
      case Text => w.text(path)
      case Excel =>
        // honor SaveMode like the Spark sinks do
        val f = new java.io.File(path.stripPrefix("file:"))
        mode match {
          case SaveMode.ErrorIfExists if f.exists() =>
            throw new IllegalStateException(s"path already exists: $path")
          case SaveMode.Ignore if f.exists() => ()
          case SaveMode.Append =>
            throw new UnsupportedOperationException("append is not supported for xlsx")
          case _ =>
            Xlsx.write(df, path, header = options.getOrElse("header", "true").toBoolean)
        }
    }
  }
}
