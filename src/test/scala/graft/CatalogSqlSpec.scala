package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.datasources.v2.{BatchScanExec, FileScan}
import org.apache.spark.sql.functions._

import graft.catalog.GraftTableCatalog

/** SQL-surface catalog (SURVEY §2.1 S5/S6 at the SQL layer): XML-declared
  * signals resolve as `SELECT … FROM graft.<container>.<signal>` through a
  * DSv2 TableCatalog, with shot-partition pruning in the plan — the SQL
  * twin of the reference's attribute-chain factory addressing. */
class CatalogSqlSpec extends SparkSpec {

  private lazy val warehouse = {
    import spark.implicits._
    val dir = "target/catalog_sql_test"
    val rows = for {
      shot <- Seq(1, 2, 3)
      ti <- 0 until 10
      ri <- 0 until 5
    } yield (shot, ti / 10.0, 10.0 + ri, shot * 1000.0 + ti + ri / 10.0)
    // hive-partitioned by shot: shot predicates must prune DIRECTORIES
    rows.toDF("shot", "time", "radius", "value")
      .write.mode("overwrite").partitionBy("shot")
      .parquet(s"$dir/mpts_te.parquet")
    val chRows = for {
      shot <- Seq(1); ch <- 1 to 4; ti <- 0 until 8
    } yield (shot, ch, ti * 1.0, (if (ti < 2) 5.0 else 10.0) + ch)
    chRows.toDF("shot", "channel", "time", "value")
      .write.mode("overwrite").parquet(s"$dir/bes_ch.parquet")
    Files.writeString(Paths.get(s"$dir/machine.xml"),
      """<container name="root" tree="t" path="\TOP">
        |  <container name="mpts" path=".MPTS">
        |    <axis name="time" node=".T"/>
        |    <axis name="radius" node=".R"/>
        |    <signal name="te" node=".TE" units="keV" title="Electron Temperature" axes="radius, time"/>
        |  </container>
        |  <container name="bes" path=".BES">
        |    <axis name="time" node=".T"/>
        |    <signal name="ch" node=".CH" axes="time"/>
        |  </container>
        |</container>""".stripMargin)
    spark.conf.set("spark.sql.catalog.graft", classOf[GraftTableCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft.xml", s"$dir/machine.xml")
    spark.conf.set("spark.sql.catalog.graft.dataDir", dir)
    spark.conf.set("spark.sql.catalog.graft.stripPrefix", "root")
    dir
  }

  test("XML-declared signal resolves through plain SQL with correct rows") {
    warehouse
    val df = spark.sql(
      "SELECT time, value FROM graft.mpts.te WHERE shot = 2 AND radius = 10.0")
    assert(df.count() === 10)
    assert(df.agg(min("value")).head().getDouble(0) === 2000.0)
    // multi-channel signal too, and the catalog-qualified name is stable
    assert(spark.sql("SELECT * FROM graft.bes.ch WHERE channel = 3").count() === 8)
  }

  test("shot predicate PRUNES partitions in the SQL path (PlanShape)") {
    warehouse
    val df = spark.sql("SELECT time, value FROM graft.mpts.te WHERE shot = 1")
    val scans = df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan
    }
    assert(scans.nonEmpty, "expected a DSv2 BatchScan")
    val fs = scans.head.asInstanceOf[FileScan]
    // the shot=1 predicate must land in partitionFilters (directory
    // pruning), not survive as a post-scan filter on data
    assert(fs.partitionFilters.map(_.sql).exists(_.contains("shot")),
      s"shot filter not pushed to partition pruning: ${fs.partitionFilters}")
    // and the pruned scan reads exactly the one shot directory (of 3)
    assert(fs.fileIndex.listFiles(fs.partitionFilters, fs.dataFilters).size === 1)
  }

  test("XML-declared units ride through the SQL path as column metadata") {
    warehouse
    // the API path carries units in StructField metadata; the SQL path
    // must too — an FDF user asking about graft.mpts.te sees 'keV'
    val schema = spark.table("graft.mpts.te").schema
    assert(schema("value").metadata.contains("units"), schema("value").metadata.json)
    assert(schema("value").metadata.getString("units") === "keV")
    // and it survives query planning, not just table resolution
    val q = spark.sql("SELECT value FROM graft.mpts.te WHERE shot = 1")
    assert(q.schema("value").metadata.getString("units") === "keV")
    // undeclared columns keep empty metadata rather than failing
    assert(!schema("shot").metadata.contains("units"))
    // title rides along too, and DESCRIBE (which renders only comments)
    // shows "title [units]" to plain SQL users
    assert(schema("value").metadata.getString("title") === "Electron Temperature")
    val described = spark.sql("DESCRIBE graft.mpts.te").collect()
      .map(r => r.getString(0) -> r.getString(2)).toMap
    assert(described("value") === "Electron Temperature [keV]")
  }

  test("listTables / namespaces / missing-table errors") {
    warehouse
    val tables = spark.sql("SHOW TABLES IN graft.mpts").collect().map(_.getString(1))
    assert(tables.toSeq === Seq("te"))
    val nss = spark.sql("SHOW NAMESPACES IN graft").collect().map(_.getString(0))
    assert(nss.sorted.toSeq === Seq("bes", "mpts"))
    val err = intercept[Exception](spark.sql("SELECT * FROM graft.mpts.nope"))
    assert(err.getMessage.toLowerCase.contains("table") ||
      err.getMessage.contains("nope"))
  }

  private def samePlanResults(sql: String, core: org.apache.spark.sql.DataFrame): Unit = {
    val viaSql = spark.sql(sql)
    assert(viaSql.schema.fieldNames.sorted === core.schema.fieldNames.sorted)
    // collected compare, not except(): Spark's ReplaceExceptWithFilter
    // trips PLAN_VALIDATION on except-ing a view against its own plan
    def rows(df: org.apache.spark.sql.DataFrame) = {
      val cols = df.schema.fieldNames.sorted.map(org.apache.spark.sql.functions.col)
      df.select(cols.toSeq: _*).collect().map(_.toSeq).sortBy(_.mkString("|"))
    }
    assert(rows(viaSql) === rows(core))
  }

  test("pipeline verbs from pure SQL: every registered view equals its gated core") {
    graft.api.PipelineSql.register(spark, sfDir)
    graft.api.PipelineSql.Verbs.foreach { case (view, f) =>
      samePlanResults(s"SELECT * FROM $view", f(spark, sfDir))
    }
  }

  test("pipeline verbs from pure SQL: minhash pairs, semdedup verdicts, curation funnel") {
    import spark.implicits._
    graft.api.PipelineSql.register(spark, sfDir)
    // minhash pairs — the TVF parameterizes the verified-Jaccard floor
    samePlanResults("SELECT * FROM minhash_pairs(0.5)",
      SparkEntry.queries("q26_minhash_lsh")(spark, sfDir)
        .where($"jaccard" >= 0.5))
    // a tighter floor strictly narrows (and is reachable from SQL only)
    val all = spark.sql("SELECT count(*) FROM minhash_pairs(0.5)").collect()(0).getLong(0)
    val tight = spark.sql("SELECT count(*) FROM minhash_pairs(0.9)").collect()(0).getLong(0)
    assert(tight < all && tight > 0, s"tvf floor did not narrow: $tight vs $all")
    // semdedup verdicts — at the core's own floor the TVF reproduces the
    // gated verdicts exactly
    samePlanResults("SELECT * FROM semdedup_verdicts(350000)",
      SparkEntry.queries("q94_semantic_dedup")(spark, sfDir)
        .select($"vec_id", $"cell", $"max_cos_q", $"kept"))
    // curation funnel — verbs compose with arbitrary SQL
    samePlanResults(
      "SELECT stage, survivors_after FROM graft_curation_funnel",
      SparkEntry.queries("q210_filter_funnel")(spark, sfDir)
        .select($"stage", $"survivors_after"))
    // and a cross-verb SQL join runs without leaving SQL: keepers of
    // near-dup clusters joined back to their language
    val joined = spark.sql(
      """SELECT l.predicted, count(*) AS n
         FROM graft_cluster_keepers k JOIN graft_langid l
           ON k.keeper_id = l.doc_id AND k.is_keeper
         GROUP BY l.predicted""").collect()
    assert(joined.nonEmpty)
  }

  test("TVF domain floors are ENFORCED: out-of-range thresholds fail loudly") {
    graft.api.PipelineSql.register(spark, sfDir)
    // below the banding design floor the candidates were never generated —
    // the call must throw, not silently under-report
    val e1 = intercept[Exception](
      spark.sql("SELECT * FROM minhash_pairs(0.3)").collect())
    assert(e1.getMessage.contains("banding design floor"),
      s"wrong error: ${e1.getMessage}")
    // the guard fires even when the in-domain result would be empty
    // (a WHERE-side guard would never evaluate on zero surviving rows)
    val e2 = intercept[Exception](
      spark.sql("SELECT count(*) FROM minhash_pairs(0.0)").collect())
    assert(e2.getMessage.contains("banding design floor"))
    val e3 = intercept[Exception](
      spark.sql("SELECT * FROM semdedup_verdicts(100000)").collect())
    assert(e3.getMessage.contains("verify floor"),
      s"wrong error: ${e3.getMessage}")
    // at and above the floors the functions answer normally
    assert(spark.sql("SELECT * FROM minhash_pairs(0.5)").collect().nonEmpty)
    assert(spark.sql("SELECT * FROM semdedup_verdicts(500000)").collect().nonEmpty)
  }

  test("re-registration releases the prior registration's checkpoints") {
    val s2 = spark.newSession()
    graft.api.PipelineSql.register(s2, sfDir)
    // materialize the wedge-sample view (forces its internal checkpoints)
    val r1 = s2.sql("SELECT * FROM graft_wedge_sample").collect()
    assert(r1.nonEmpty)
    // re-register: must not throw, must release the superseded
    // checkpoints (Ckpt.release is identity-guarded, so this passing
    // means only owned storage was touched), and the fresh views must
    // still answer
    graft.api.PipelineSql.register(s2, sfDir)
    val r2 = s2.sql("SELECT * FROM graft_wedge_sample").collect()
    assert(r2.map(_.toSeq.mkString("|")).sorted.toSeq ===
      r1.map(_.toSeq.mkString("|")).sorted.toSeq)
  }
}
