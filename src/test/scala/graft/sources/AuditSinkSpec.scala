package graft.sources

import java.nio.file.Files

import graft.SparkSpec

/** The DSv2 write path: task tallies travel as commit messages, the audit
  * summary appears exactly once on driver commit, and a failing task
  * aborts the job with NO summary written (atomicity).
  */
class AuditSinkSpec extends SparkSpec {
  import spark.implicits._
  import scala.collection.JavaConverters._

  private def listAudits(dir: String) = {
    val p = java.nio.file.Paths.get(dir)
    if (!Files.exists(p)) Seq.empty
    else Files.list(p).iterator().asScala.toSeq
  }

  test("commit writes one summary with exact row and null tallies") {
    val dir = Files.createTempDirectory("graft-audit").toString
    Seq((1L, Some("a")), (2L, None), (3L, Some("c")), (4L, None))
      .toDF("id", "name")
      .repartition(3)
      .write.format("graft-audit").option("path", dir)
      .mode("overwrite").save()
    val files = listAudits(dir)
    assert(files.length === 1)
    val json = new String(Files.readAllBytes(files.head))
    assert(json.contains("\"rows\":4"))
    assert(json.contains("\"tasks\":3"))
    assert(json.contains("\"id\":0"))
    assert(json.contains("\"name\":2"))
  }

  test("a poisoned row aborts the job and writes NO summary") {
    val dir = Files.createTempDirectory("graft-audit-abort").toString
    val ex = intercept[Exception] {
      Seq(1L, 2L, -5L, 4L).toDF("id")
        .repartition(2)
        .write.format("graft-audit").option("path", dir)
        .option("fail.on.negative", "true")
        .mode("overwrite").save()
    }
    assert(ex.getMessage != null)
    assert(listAudits(dir).isEmpty, "abort must leave no audit summary")
  }

  test("every write commits its own summary file (no clobbering)") {
    val dir = Files.createTempDirectory("graft-audit-multi").toString
    Seq(1L).toDF("id").write.format("graft-audit")
      .option("path", dir).mode("overwrite").save()
    Seq(2L, 3L).toDF("id").write.format("graft-audit")
      .option("path", dir).mode("overwrite").save()
    assert(listAudits(dir).length === 2)
  }
}
