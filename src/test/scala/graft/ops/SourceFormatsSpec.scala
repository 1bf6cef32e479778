package graft.ops

import graft.SparkSpec
import java.nio.file.Files

/** Source/sink format breadth: the engine's tables round-trip losslessly
  * through ORC and JSON-lines, not just parquet/CSV.
  */
class SourceFormatsSpec extends SparkSpec {

  private lazy val nation = spark.read.parquet(s"$sf0001/nation.parquet")

  test("ORC round-trip preserves rows and schema") {
    val dir = Files.createTempDirectory("graft-orc").toString
    nation.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.schema === nation.schema)
    assert(back.collect().toSet === nation.collect().toSet)
  }

  test("JSON-lines round-trip preserves rows (schema-on-read)") {
    val dir = Files.createTempDirectory("graft-jsonl").toString
    nation.write.mode("overwrite").json(dir)
    val back = spark.read.schema(nation.schema).json(dir)
    assert(back.collect().toSet === nation.collect().toSet)
  }
}
