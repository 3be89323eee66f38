package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** Committer-free atomic append for small control-plane tables (ledger,
  * evolution log): write a tiny parquet to a uniquely-named staging dir,
  * then rename the part file into the table directory.
  *
  * Spark's output committer shares one `_temporary` dir per target path,
  * so concurrent writers appending the same table would clobber each
  * other mid-commit; a rename of a uniquely-named file cannot collide
  * (the reference's equivalent is concurrent Lambdas INSERTing into one
  * database table, which the engine serializes).
  */
private[graft] object ParquetAppend {

  def exists(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  def append(spark: SparkSession, path: String, rows: Seq[Row], schema: StructType): Unit = {
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val id = java.util.UUID.randomUUID().toString.take(12)
    val tmp = new Path(path + s".append-$id")
    df.coalesce(1).write.parquet(tmp.toString)
    val part = fs.listStatus(tmp)
      .map(_.getPath).find(_.getName.endsWith(".parquet"))
      .getOrElse(throw new IllegalStateException(s"no parquet part under $tmp"))
    fs.mkdirs(new Path(path))
    // must not start with '_' or '.' — Spark hides such files on read
    fs.rename(part, new Path(path, s"part-append-$id.parquet"))
    fs.delete(tmp, true)
  }
}
