package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.web.WarcWet
import graft.web.WarcWet.WetRecord

/** The Common Crawl WET reader: golden fixture from an INDEPENDENT
  * Python gzip writer, writer→reader roundtrips, split-boundary
  * exactly-once, and corrupt-member drop semantics.
  */
class WarcWetSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(name: String): String = {
    val f = java.io.File.createTempFile(name, ".warc.wet.gz")
    f.deleteOnExit()
    f.getAbsolutePath
  }

  private val battery = Seq(
    WetRecord("http://a.example/1", "conversion", "2024-02-01T00:00:00Z", 0L, "plain ascii body"),
    WetRecord("http://b.example/2", "conversion", "2024-02-01T00:00:01Z", 0L, "héllo wörld 中文 → multibyte"),
    WetRecord("http://c.example/3", "response", "2024-02-01T00:00:02Z", 0L, ""),
    WetRecord("http://d.example/4", "conversion", "2024-02-01T00:00:03Z", 0L, "line one\nline two\r\nline three"),
    WetRecord("http://e.example/5", "conversion", "2024-02-01T00:00:04Z", 0L, "y" * 20000))

  test("golden fixture from the independent Python writer reads exactly") {
    val got = WarcWet.read(spark, "src/test/resources/golden.warc.wet.gz")
      .as[WetRecord].collect().sortBy(_.url)
    assert(got.length == 4, got.map(_.url).toSeq.toString)
    val byUrl = got.map(r => r.url -> r).toMap
    assert(byUrl("http://example.com/a").text == "Hello web corpus.\nSecond line.")
    assert(byUrl("http://example.org/b?q=1").text == "Unicode: héllo wörld 中文 →")
    assert(byUrl("http://example.org/b?q=1").warc_type == "conversion")
    assert(byUrl("http://example.net/c").text == "" && byUrl("http://example.net/c").warc_type == "response")
    assert(byUrl("http://example.com/d").text == "x" * 5000)
    assert(byUrl("http://example.com/d").length == 5000L)
    assert(got.forall(_.date.startsWith("2024-01-15")))
  }

  test("writer -> reader roundtrip preserves every record") {
    val p = tmp("roundtrip")
    WarcWet.write(p, battery)
    val got = WarcWet.read(spark, p).as[WetRecord].collect().sortBy(_.url)
    assert(got.map(_.url).toSeq == battery.map(_.url).sorted)
    val byUrl = got.map(r => r.url -> r).toMap
    battery.foreach { r =>
      assert(byUrl(r.url).text == r.text, r.url)
      assert(byUrl(r.url).warc_type == r.warc_type, r.url)
      assert(byUrl(r.url).date == r.date, r.url)
      assert(byUrl(r.url).length == r.text.getBytes("UTF-8").length.toLong, r.url)
    }
  }

  test("tiny ranges force members across split boundaries; still exactly-once") {
    val p = tmp("splits")
    WarcWet.write(p, battery)
    val fileLen = new java.io.File(p).length()
    // 64-byte ranges: every member straddles several; ownership by
    // first byte must still emit each record exactly once
    val got = WarcWet.read(spark, p, rangeBytes = 64L).as[WetRecord].collect()
    assert(fileLen > 64, "fixture must actually span multiple ranges")
    assert(got.length == battery.length, s"${got.length} records from tiny ranges")
    assert(got.map(_.url).sorted.toSeq == battery.map(_.url).sorted)
  }

  test("a corrupted member drops; its neighbors survive") {
    val p = tmp("corrupt")
    WarcWet.write(p, battery)
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p))
    // flip a byte in the MIDDLE of the file (inside some member's
    // deflate stream) — that member's CRC fails and it drops
    bytes(bytes.length / 2) = (bytes(bytes.length / 2) ^ 0x5a).toByte
    java.nio.file.Files.write(java.nio.file.Paths.get(p), bytes)
    val got = WarcWet.read(spark, p).as[WetRecord].collect()
    assert(got.length < battery.length, "the corrupted member must drop")
    assert(got.length >= battery.length - 2, s"neighbors survive (got ${got.length})")
    assert(got.forall(r => battery.exists(b => b.url == r.url && b.text == r.text)),
      "surviving records decode exactly")
  }

  test("non-WARC gzip members and garbage bytes are skipped, not fatal") {
    val p = tmp("mixed")
    val fos = new java.io.FileOutputStream(p)
    fos.write(Array.fill(100)(0x1f.toByte)) // magic-looking garbage
    fos.close()
    // append one real record after the garbage via the writer path
    val real = tmp("realtail")
    WarcWet.write(real, battery.take(1))
    val all = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)) ++
      makeGzip("not a warc payload") ++
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(real))
    java.nio.file.Files.write(java.nio.file.Paths.get(p), all)
    val got = WarcWet.read(spark, p).as[WetRecord].collect()
    assert(got.length == 1 && got.head.url == battery.head.url,
      "only the genuine WARC member surfaces")
  }

  test("writeSharded: one self-contained shard per partition; directory read unions them") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("wet_shards").toString
    val df = spark.range(0, 40).repartition(4)
      .select(concat(lit("doc://"), col("id")).as("url"),
        lit("conversion").as("warc_type"), lit("2024-03-01T00:00:00Z").as("date"),
        concat(lit("body of "), col("id")).as("text"))
    val shards = graft.web.WarcWet.writeSharded(df, dir)
    assert(shards.length == 4, s"one shard per partition: $shards")
    // every shard independently readable
    shards.foreach { sh =>
      assert(graft.web.WarcWet.read(spark, sh).count() > 0, s"shard $sh reads alone") }
    // the directory read unions all shards exactly-once
    val got = graft.web.WarcWet.read(spark, dir, rangeBytes = 128L)
      .as[WetRecord].collect()
    assert(got.length == 40, s"${got.length} records from the directory")
    assert(got.map(_.url).sorted.toSeq == (0 until 40).map(i => s"doc://$i").sorted)
    got.foreach(r => assert(r.text == s"body of ${r.url.drop(6)}", r.url))
  }

  private def makeGzip(s: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(s.getBytes("UTF-8")); gz.close()
    bos.toByteArray
  }
  test("torn sharded export is detected: missing shard, truncated shard, missing manifest all refuse to read") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("wet_torn").toString
    val df = spark.range(0, 30).repartition(3)
      .select(concat(lit("doc://"), col("id")).as("url"),
        lit("conversion").as("warc_type"), lit("2024-03-01T00:00:00Z").as("date"),
        concat(lit("body of "), col("id")).as("text"))
    val shards = graft.web.WarcWet.writeSharded(df, dir)
    assert(shards.length == 3)
    // complete export reads clean through the manifest gate
    assert(graft.web.WarcWet.read(spark, dir).count() == 30)

    // a shard deleted mid-"commit": the directory still LOOKS like a
    // crawl layout, but the manifest names the hole
    val victim = new java.io.File(shards(1))
    assert(victim.delete())
    val exMissing = intercept[IllegalStateException] {
      graft.web.WarcWet.read(spark, dir).count()
    }
    assert(exMissing.getMessage.contains(victim.getName), exMissing.getMessage)

    // a truncated (killed-stream) shard: present but short
    val full = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(shards(0)))
    java.nio.file.Files.write(java.nio.file.Paths.get(shards(0)), full.dropRight(5))
    java.nio.file.Files.write(java.nio.file.Paths.get(shards(1)), full) // restore the deleted one
    val exShort = intercept[IllegalStateException] {
      graft.web.WarcWet.read(spark, dir).count()
    }
    assert(exShort.getMessage.contains("bytes"), exShort.getMessage)

    // a killed job never writes the manifest at all: the directory
    // must not read as a complete export by default...
    val dir2 = java.nio.file.Files.createTempDirectory("wet_nomani").toString
    graft.web.WarcWet.writeSharded(df, dir2)
    java.nio.file.Files.delete(java.nio.file.Paths.get(dir2, graft.sources.ExportManifest.Name))
    val exNone = intercept[IllegalStateException] {
      graft.web.WarcWet.read(spark, dir2).count()
    }
    assert(exNone.getMessage.contains(graft.sources.ExportManifest.Name), exNone.getMessage)
    // ...but an EXTERNAL crawl dir (no manifest discipline) stays
    // readable on explicit opt-out
    assert(graft.web.WarcWet.read(spark, dir2, requireManifest = false).count() == 30)
  }

  test("re-export over a populated directory: old manifest dies first, stale shards are swept") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("wet_reexport").toString
    def corpus(n: Int, parts: Int) = spark.range(0, n).repartition(parts)
      .select(concat(lit("doc://"), col("id")).as("url"),
        lit("conversion").as("warc_type"), lit("2024-03-01T00:00:00Z").as("date"),
        concat(lit("body of "), col("id")).as("text"))
    graft.web.WarcWet.writeSharded(corpus(30, 3), dir)

    // a RE-export into the same directory that dies mid-job must not
    // leave the previous manifest verifying the previous shards as a
    // complete export: the writer's FIRST act is manifest + stale-
    // shard invalidation, replayed here up to the simulated kill
    graft.sources.ExportManifest.invalidate(spark, dir)
    val exTorn = intercept[IllegalStateException] {
      graft.web.WarcWet.read(spark, dir).count()
    }
    assert(exTorn.getMessage.contains(graft.sources.ExportManifest.Name), exTorn.getMessage)

    // a COMPLETED narrower re-export (fewer partitions than run 1)
    // must not leave run 1's extra shards next to the new manifest
    graft.web.WarcWet.writeSharded(corpus(10, 1), dir)
    val files = new java.io.File(dir).listFiles().map(_.getName).sorted.toSeq
    assert(files.count(_.endsWith(".warc.wet.gz")) == 1, s"stale shards remain: $files")
    assert(graft.web.WarcWet.read(spark, dir).count() == 10)
  }

  test("writeSharded through a file:-scheme Hadoop path: object-store-shaped sink, no java.io in the write path") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("wet_hpath").toString
    val df = spark.range(0, 20).repartition(2)
      .select(concat(lit("doc://"), col("id")).as("url"),
        lit("conversion").as("warc_type"), lit("2024-03-01T00:00:00Z").as("date"),
        concat(lit("body of "), col("id")).as("text"))
    // an explicit URI scheme exercises the Hadoop FileSystem sink the
    // way an object-store path (s3a://…) would — resolution, create,
    // attempt-temp, rename, manifest all through the FS abstraction
    val shards = graft.web.WarcWet.writeSharded(df, s"file:$dir")
    assert(shards.length == 2 && shards.forall(_.startsWith(s"file:$dir/part-")), shards.toString)
    // committed layout: no stranded attempt temps, manifest present
    val names = new java.io.File(dir).listFiles().map(_.getName).toSeq
    assert(!names.exists(_.endsWith(".tmp")), s"stranded temps: $names")
    assert(names.contains(graft.sources.ExportManifest.Name), names.toString)
    // plain-path readback reconciles through the manifest gate
    val got = graft.web.WarcWet.read(spark, dir).as[WetRecord].collect()
    assert(got.length == 20)
    assert(got.map(_.url).sorted.toSeq == (0 until 20).map(i => s"doc://$i").sorted)
  }
}
