package graft

import org.apache.spark.sql.functions._

import graft.operators._

/** Column-level parity between the end-to-end crawl composition
  * (`pipeline_crawl_e2e`) and the standalone gate queries it composes —
  * the audit cannot drift from the filters it explains. The DuckDB
  * oracle gates the VALUES; this spec pins the PROVENANCE claim: each
  * e2e column equals the standalone query's column on the same docs. */
class CrawlE2eSpec extends SparkSessionSpec {

  private val sf = "/root/testdata/sf0.001"

  private lazy val e2e = Pipeline.pipelineCrawlE2e(spark, sf)
    .collect().map(r => r.getLong(0) -> r).toMap

  test("e2e audit covers exactly the odd-id crawl batch") {
    val odd = Tables.t(spark, sf, "documents")
      .where(col("doc_id") % 2 === 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(e2e.keySet == odd)
  }

  test("robots_allowed equals the standalone REP gate's verdict") {
    val standalone = Pipeline.pipelineRobots(spark, sf)
      .select("doc_id", "allowed").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    e2e.foreach { case (id, r) =>
      assert(r.getAs[Boolean]("robots_allowed") == standalone(id),
        s"doc $id robots verdict drifted from pipeline_robots")
    }
  }

  test("url_blocked equals the standalone blocklist filter's verdict") {
    val standalone = Pipeline.pipelineUrlFilter(spark, sf)
      .select("doc_id", "kept").collect()
      .map(r => r.getLong(0) -> !r.getBoolean(1)).toMap
    e2e.foreach { case (id, r) =>
      assert(r.getAs[Boolean]("url_blocked") == standalone(id),
        s"doc $id blocklist verdict drifted from pipeline_url_filter")
    }
  }

  test("pred_lang equals the standalone marker language-ID") {
    val standalone = TextAnalysis.textLangId(spark, sf)
      .select("doc_id", "pred_lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    e2e.foreach { case (id, r) =>
      assert(r.getAs[String]("pred_lang") == standalone(id),
        s"doc $id language drifted from text_langid")
    }
  }

  test("contaminated equals the provenance audit's eval-shingle screen") {
    val standalone = Pipeline.pipelineProvenance(spark, sf)
      .select("doc_id", "contaminated").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    e2e.foreach { case (id, r) =>
      assert(r.getAs[Boolean]("contaminated") == standalone(id),
        s"doc $id contamination drifted from pipeline_provenance")
    }
  }

  test("paragraph-screen counts equal the standalone cross-corpus screen") {
    val standalone = Dedup.dedupParagraphScreen(spark, sf)
      .select("doc_id", "n_segs", "n_removed").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    e2e.foreach { case (id, r) =>
      val got = (r.getAs[Long]("n_segs"), r.getAs[Long]("n_removed"))
      // docs under ParaW tokens have no segments: standalone omits
      // them, the audit carries (0, 0)
      assert(got == standalone.getOrElse(id, (0L, 0L)),
        s"doc $id paragraph screen drifted from dedup_paragraph_screen")
    }
  }

  test("per-host quota keeps exactly min(cap, host size) docs") {
    val byHost = e2e.values.groupBy(_.getAs[String]("host"))
    byHost.foreach { case (host, rows) =>
      val kept = rows.count(_.getAs[Boolean]("quota_kept"))
      assert(kept == math.min(Pipeline.DomainCap, rows.size),
        s"host $host keeps $kept of ${rows.size} under cap " +
          s"${Pipeline.DomainCap}")
    }
  }

  test("kept is exactly the conjunction of the gate columns") {
    e2e.values.foreach { r =>
      val expect = r.getAs[Boolean]("robots_allowed") &&
        !r.getAs[Boolean]("url_blocked") &&
        r.getAs[Boolean]("quota_kept") &&
        r.getAs[String]("pred_lang") == "en" &&
        r.getAs[Boolean]("quality_ok") &&
        !r.getAs[Boolean]("contaminated") &&
        r.getAs[Long]("n_removed") < r.getAs[Long]("n_segs")
      assert(r.getAs[Boolean]("kept") == expect,
        s"doc ${r.getLong(0)}: kept is not the gate conjunction")
    }
  }
}
