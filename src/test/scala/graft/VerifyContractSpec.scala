package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** The driver contract end-to-end: Verify.main must dump one parquet
  * dir per registered query plus a parseable oracle_sql.json whose
  * keys equal SparkEntry.oracleSql.
  */
class VerifyContractSpec extends AnyFunSuite {

  test("Verify.run dumps every query and a well-formed oracle json") {
    val out = Files.createTempDirectory("graft_verify").toString
    val failures = Verify.run(TestSpark.spark, TestSpark.Sf, out)
    assert(failures.isEmpty, failures.map { case (n, e) =>
      s"$n: ${e.getClass.getSimpleName} ${Option(e.getMessage).getOrElse("").take(500)}"
    }.mkString("; "))
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName).toSet
    assert(dirs == SparkEntry.queries.keySet, {
      val missing = SparkEntry.queries.keySet -- dirs
      s"missing query dumps: $missing"
    })
    val json = Files.readString(java.nio.file.Paths.get(s"$out/oracle_sql.json"))
    // minimal JSON sanity: parses as a flat string map with the right
    // keys. Top-level keys are the only strings that follow `{` or
    // `",` — don't enumerate name prefixes here (round 8: a new
    // `pipe_` family silently failed the old prefix alternation)
    val keyPattern = "[{,]\"([a-z0-9_]+)\"\\s*:".r
    val keys = keyPattern.findAllMatchIn(json).map(_.group(1)).toSet
    assert(keys == SparkEntry.oracleSql.keySet,
      s"missing: ${SparkEntry.oracleSql.keySet -- keys}; extra: ${keys -- SparkEntry.oracleSql.keySet}")
    assert(!json.contains("\n") && !json.contains("\t"), "control chars must be escaped")
  }
}
