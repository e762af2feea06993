package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver-provided synthetic tables
  * (TESTDATA.md) and generic IO helpers.
  *
  * Reference ingest surface: CSV-per-week scans unioned into one table
  * (`main_cuda.py:120-138`) — in Spark a single multi-path scan; the
  * reference's multiprocessing.Pool is subsumed by Spark's file-split
  * parallelism (SURVEY.md §2.1 S1-S3).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** events with ts kept as INTEGER epoch-micros (`ts DIV 1000` on
    * the raw nanos — long division; a double route would corrupt
    * low micros). For queries whose time math must stay on the
    * integer domain (sessionization, retention, SCD-2). */
  def eventsUs(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("ts_us",
        org.apache.spark.sql.functions.expr("ts DIV 1000"))
  }

  /** events.parquet stores TIMESTAMP(NANOS), which Spark's parquet
    * reader rejects. Read nanos as long (legacy conf) and truncate to
    * microsecond timestamps — exactly what DuckDB's reader does, so
    * the oracle sees identical instants.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
  }

  /** CSV scan with explicit schema — schema inference at 100 TB is a
    * non-starter, so every CSV read declares its StructType
    * (FIXTURES.md). Mirrors `pd.read_csv` S1 (`main_cuda.py:120-123`).
    */
  def csv(spark: SparkSession, schema: org.apache.spark.sql.types.StructType,
          paths: String*): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(paths: _*)

  /** Submission sink S4 (`main_cuda.py:1533-1541`): single-file CSV with
    * header. coalesce(1) is only acceptable for the small submission
    * table; bulk results go to parquet partitioned writes.
    */
  def writeSubmission(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite").option("header", "true").csv(path)
}
