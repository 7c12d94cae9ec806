package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** JDBC catalog access — SURVEY §2.1 S9, the reference's Postgres
  * profile/feature catalog (`docker/postgres/init.sql:100-183`,
  * `services/flink-jobs/.../services/RedisService.java` fallback
  * reads) re-expressed through Spark's standard JDBC source.
  *
  * The image ships no PostgreSQL driver (SourceFormatsSpec pins
  * that), but Spark's own metastore engine — embedded Derby,
  * `derby*.jar` on the distribution classpath — is a complete SQL
  * database with a JDBC driver. The catalog path therefore runs FOR
  * REAL here: DataFrame → JDBC table → partitioned parallel read
  * with filter pushdown, against an embedded Derby standing in for
  * Postgres. Swapping to the production database is a URL + driver
  * option change; every Spark-side mechanism (dbtable vs query
  * pushdown, partitionColumn striping, fetchsize) is identical.
  *
  * Scale notes: a naive `spark.read.jdbc` is a SINGLE-task scan — at
  * catalog sizes that matters (millions of profiles), always use
  * [[readPartitioned]], which stripes the table across
  * `numPartitions` concurrent connections on a numeric column
  * (Spark generates one bounded WHERE clause per stripe) — and let
  * pushed filters cut each stripe server-side before it crosses the
  * wire. Dimension-sized results then broadcast into the enrichment
  * join exactly like the parquet mirrors do.
  */
object JdbcCatalog {
  /** Derby 10.15+ moved the embedded driver to derbytools. */
  val DerbyDriver = "org.apache.derby.jdbc.EmbeddedDriver"

  /** URL for an embedded Derby database at `dir` (created on first
    * use). Derby's error log is pointed at java.io.tmpdir instead of
    * the working directory.
    */
  def derbyUrl(dir: String): String = {
    System.setProperty("derby.stream.error.file",
      s"${System.getProperty("java.io.tmpdir")}/graft_derby.log")
    s"jdbc:derby:$dir;create=true"
  }

  /** `columnTypes`: explicit DDL types for the created table (Spark's
    * `createTableColumnTypes`), e.g. `"user_id VARCHAR(32)"`. Derby
    * maps Spark StringType to CLOB by default, and CLOB columns
    * cannot take pushed-down comparisons — declare VARCHAR like the
    * reference DDL does (`init.sql:101-131`) so predicates push.
    */
  def write(df: DataFrame, url: String, table: String,
            driver: String = DerbyDriver,
            mode: SaveMode = SaveMode.Overwrite,
            columnTypes: Option[String] = None): Unit = {
    val w = df.write.format("jdbc")
      .option("url", url).option("dbtable", table)
      .option("driver", driver)
    columnTypes.foreach(w.option("createTableColumnTypes", _))
    w.mode(mode).save()
  }

  /** Whole-table read — ONE task; only for tiny control tables. */
  def read(spark: SparkSession, url: String, table: String,
           driver: String = DerbyDriver): DataFrame =
    spark.read.format("jdbc")
      .option("url", url).option("dbtable", table)
      .option("driver", driver)
      .load()

  /** Partition-striped parallel read — the production shape: each of
    * `numPartitions` tasks opens its own connection and scans one
    * `partitionColumn` stripe of [lower, upper]; Catalyst-pushed
    * filters apply server-side per stripe.
    */
  def readPartitioned(spark: SparkSession, url: String, table: String,
                      partitionColumn: String, lower: Long, upper: Long,
                      numPartitions: Int,
                      driver: String = DerbyDriver): DataFrame =
    spark.read.format("jdbc")
      .option("url", url).option("dbtable", table)
      .option("driver", driver)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lower).option("upperBound", upper)
      .option("numPartitions", numPartitions)
      .load()
}
