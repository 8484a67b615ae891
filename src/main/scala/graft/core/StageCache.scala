package graft.core

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Cross-run stage cache (SURVEY §2.13; reference
  * src/utils/cache_manager.py:17-205 pickles stage outputs keyed by
  * md5(operation + data signature + params) with a TTL).
  *
  * Spark-native form: materialize the stage output as parquet keyed by the
  * caller-computed signature. Parquet IS the cache — columnar, splittable,
  * shared across sessions; the medallion layout gives the same semantics
  * for the standard stages, and this helper covers ad-hoc ones. TTL uses
  * the directory mtime, mirroring the reference's 24 h default.
  */
object StageCache {

  final case class Stats(var hits: Long = 0, var misses: Long = 0)
  val stats = Stats()

  def key(operation: String, dataSignature: String, params: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s"$operation|$dataSignature|$params".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** Read-through cache: returns the cached frame when present and fresh,
    * else computes, writes, and returns the materialized result.
    */
  def cached(spark: SparkSession, basePath: String, cacheKey: String,
      ttlMillis: Long = 24L * 3600 * 1000)(compute: => DataFrame): DataFrame = {
    val dir = new Path(s"$basePath/$cacheKey")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val fresh = fs.exists(dir) &&
      (System.currentTimeMillis() - fs.getFileStatus(dir).getModificationTime) < ttlMillis
    if (fresh) {
      stats.hits += 1
      spark.read.parquet(dir.toString)
    } else {
      stats.misses += 1
      compute.write.mode("overwrite").option("compression", "snappy")
        .parquet(dir.toString)
      spark.read.parquet(dir.toString)
    }
  }

  def invalidate(spark: SparkSession, basePath: String, cacheKey: String): Boolean = {
    val dir = new Path(s"$basePath/$cacheKey")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(dir, true)
  }
}
