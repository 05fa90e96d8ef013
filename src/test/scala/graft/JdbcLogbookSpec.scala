package graft

import java.sql.{Date, DriverManager, Timestamp}

import org.apache.spark.sql.functions._

import graft.api.Machine
import graft.catalog.SignalCatalog

/** SURVEY §2 S3: the reference reads its run logbook over a SQL connection
  * (`/root/reference/fdf/factory.py:515-648`, pymssql) — the Spark-first
  * mapping is `spark.read.jdbc` feeding the same `Machine.logbook` relation
  * the parquet shape uses. This spec exercises that mapping end-to-end
  * against an EMBEDDED public JDBC database (Apache Derby in-memory, on the
  * Spark classpath) — no network, no external service:
  *
  *   - schema inference over JDBC (DATE / TIMESTAMP / nullable VARCHAR)
  *   - predicate pushdown INTO the JDBC scan (the 100 TB-relevant property:
  *     the `voided IS NULL` / `xp = ?` filters must run in the database,
  *     not in Spark after a full-table fetch)
  *   - the shotlist union/distinct/orderBy and shotMeta group-bys produce
  *     the same answers as the parquet-backed logbook path (ApiSpec)
  */
class JdbcLogbookSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftlb;create=true"

  private lazy val seeded: Unit = {
    // Derby's embedded driver autoloads via java.sql service discovery.
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute(
        """CREATE TABLE logbook (
          |  shot INT, xp INT, rundate DATE, entered TIMESTAMP,
          |  voided VARCHAR(20), brief VARCHAR(200))""".stripMargin)
      val ins = conn.prepareStatement(
        "INSERT INTO logbook VALUES (?, ?, ?, ?, ?, ?)")
      val rows = Seq(
        (101, 7, "2024-01-01", "2024-01-01 08:00:00", null, "first"),
        (101, 7, "2024-01-01", "2024-01-01 08:30:00", null, "follow-up"),
        (102, 7, "2024-01-02", "2024-01-02 08:00:00", null, "second"),
        (103, 8, "2024-01-01", "2024-01-01 09:00:00", null, "other xp"),
        (104, 9, "2024-02-01", "2024-02-01 08:00:00", "void", "voided"))
      rows.foreach { case (shot, xp, rd, ent, vd, br) =>
        ins.setInt(1, shot); ins.setInt(2, xp)
        ins.setDate(3, Date.valueOf(rd))
        ins.setTimestamp(4, Timestamp.valueOf(ent))
        if (vd == null) ins.setNull(5, java.sql.Types.VARCHAR)
        else ins.setString(5, vd)
        ins.setString(6, br)
        ins.executeUpdate()
      }
      st.close(); ins.close()
    } finally conn.close()
  }

  private def jdbcLogbook = {
    seeded
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", "logbook")
      .load()
      // Derby SQL identifiers come back upper-case; Machine expects the
      // canonical lower-case logbook schema.
      .toDF("shot", "xp", "rundate", "entered", "voided", "brief")
  }

  test("jdbc logbook: schema inferred, shotlist matches parquet semantics (S3)") {
    val m = Machine(spark, SignalCatalog(Nil), "target/na", Some(jdbcLogbook))
    val shots = m.shotlist(xps = Seq(7), dates = Seq(Date.valueOf("2024-01-01")))
      .collect().map(_.getInt(0)).toSeq
    assert(shots === Seq(101, 102, 103)) // dup 101 entries collapse; 104 voided
    val meta = m.shotMeta.where(col("shot") === 101).head()
    assert(meta.getAs[Seq[Int]]("xps") === Seq(7))
    assert(meta.getAs[Date]("date") === Date.valueOf("2024-01-01"))
  }

  test("jdbc logbook: filters push down into the database scan (S3 at scale)") {
    val filtered = jdbcLogbook.where(col("voided").isNull && col("xp") === 7)
      .select("shot")
    val plan = filtered.queryExecution.executedPlan.toString
    // JDBCScan advertises what it shipped to the database: both predicates
    // must appear as PushedFilters, not as a Spark-side Filter over a full
    // table fetch.
    assert(plan.contains("PushedFilters"), plan)
    assert(plan.contains("VOIDED") || plan.contains("voided"), plan)
    assert(plan.contains("XP") || plan.contains("xp"), plan)
    assert(filtered.count() === 3)
  }
}
