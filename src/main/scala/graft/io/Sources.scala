package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Source/sink helpers — SURVEY.md §2.1 parity: FileCollection-style
  * gather/filter/select over file lists (`base.py:91-182`), natural sort
  * (`base.py:71-89`), multi-format readers, parquet append sink
  * (`fprocessing.py:2700-2722`), repartitioned split write
  * (`hdf5Splitter.split` analogue, `fprocessing.py:1885-1941`).
  *
  * HDF5/Igor instrument formats are ingest-time conversions outside the
  * cluster path (the reference itself canonicalizes to parquet,
  * `fprocessing.py:843-849`); parquet is the on-cluster format.
  */
object Sources {

  /** Natural sort: split digit runs and compare numerically
    * (`natsorted` semantics for the common file-name case). */
  def naturalSort(names: Seq[String]): Seq[String] = {
    def key(s: String): Seq[Either[Long, String]] =
      "\\d+|\\D+".r.findAllIn(s).map { part =>
        if (part.head.isDigit && part.length <= 18) Left(part.toLong) else Right(part)
      }.toSeq
    names.sortWith { (a, b) =>
      val (ka, kb) = (key(a), key(b))
      ka.zip(kb).find { case (x, y) => x != y } match {
        case Some((Left(x), Left(y))) => x < y
        case Some((Left(_), Right(_))) => true // numbers before text
        case Some((Right(_), Left(_))) => false
        case Some((Right(x), Right(y))) => x < y
        case None => ka.length < kb.length
      }
    }
  }

  /** FileCollection.gather: glob a directory, natural-sorted. */
  def gather(dir: String, pattern: String = "*"): Seq[String] = {
    val d = new java.io.File(dir)
    val rx = ("^" + pattern.replace(".", "\\.").replace("*", ".*").replace("?", ".") + "$").r
    val files = Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => rx.findFirstIn(f.getName).isDefined)
      .map(_.getPath).toSeq
    naturalSort(files)
  }

  /** FileCollection.select by index ranges (`base.py:146-182`). */
  def select(files: Seq[String], ids: Seq[Int]): Seq[String] = ids.map(files)

  /** Multi-format reader (`readDataframe`, `fprocessing.py:1962-2027`). */
  def readFiles(spark: SparkSession, paths: Seq[String], ftype: String = "parquet"): DataFrame =
    ftype match {
      case "parquet" => spark.read.parquet(paths: _*)
      case "json" => spark.read.json(paths: _*)
      case "csv" => spark.read.option("header", "true").option("inferSchema", "true").csv(paths: _*)
      case "tsv" => spark.read.option("sep", "\t").option("header", "true")
        .option("inferSchema", "true").csv(paths: _*)
      case other => throw new IllegalArgumentException(s"unsupported ftype $other")
    }

  /** Parquet sink with append option (`convert(form='parquet')`). */
  def writeParquet(df: DataFrame, path: String, append: Boolean = false): Unit =
    df.write.mode(if (append) "append" else "overwrite").parquet(path)

  /** Split one table into n roughly equal files (`hdf5Splitter.split`
    * analogue): repartition + write, one file per partition. */
  def splitWrite(df: DataFrame, path: String, nSplits: Int): Unit =
    df.repartition(nSplits).write.mode("overwrite").parquet(path)

  /** Scale-aware materialization: range-partition on `sortCols`, sort
    * within partitions on the same keys, and cap rows per output file —
    * the layout a 100 TB corpus write actually needs. Range partitioning
    * (not hash) makes every file cover a contiguous key interval, so a
    * downstream reader filtering on the leading sort key prunes whole
    * files via parquet min/max; the in-file sort tightens row-group
    * statistics the same way; `maxRecordsPerFile` keeps any single task
    * from emitting an unsplittable monster file regardless of skew.
    * `nPartitions` sizes the parallelism explicitly (files-per-write ≈
    * nPartitions × ceil(rows_in_partition / maxRecordsPerFile)).
    */
  def writeSorted(df: DataFrame, path: String, sortCols: Seq[String],
                  nPartitions: Int, maxRecordsPerFile: Long): Unit = {
    require(sortCols.nonEmpty, "writeSorted needs at least one sort column")
    val keys = sortCols.map(org.apache.spark.sql.functions.col)
    df.repartitionByRange(nPartitions, keys: _*)
      .sortWithinPartitions(keys: _*)
      .write
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode("overwrite")
      .parquet(path)
  }
}
