package graft.osm

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed `.osm` / `.osc` XML source → [[OsmModel]] datasets —
  * the ingestion step the reference performs with osmium/OGR
  * (changegen/generator.py:35-53 `_get_way_node_map`,
  * changegen/__main__.py:26-53 max-id scan).
  *
  * Mechanics (pure Spark, no XML library): the file is read THREE
  * times with `lineSep` set to the element's end tag (`</node>`,
  * `</way>`, `</relation>`), so the text source splits records on
  * element boundaries at arbitrary file offsets — one planet-scale
  * file still parallelizes across the cluster. Within a chunk, every
  * complete element of the target type is either
  *   - self-closing (`<node …/>`, matched wholesale), or
  *   - the single trailing open element whose end tag WAS the record
  *     separator (captured from the last `<node` to end-of-chunk).
  * Elements of other types never contain the separator string, so
  * they can never straddle chunk boundaries or corrupt the capture.
  * All attribute/tag extraction is regexp over the element fragment —
  * codegen'd column expressions, no UDF.
  *
  * Format assumptions (canonical OSM writers — osmium, JOSM, the
  * reference's changewriter): double-quoted attributes, `k` before
  * `v` on `<tag>`, `type,ref,role` order on `<member>`. Entity
  * escapes (&amp; &lt; &gt; &quot; &apos;) are decoded.
  */
object OsmXmlSource {

  /** Reverse of OsmChangeXml.xmlEscape (+ &apos;): amp decoded LAST so
    * double-escaped text round-trips. */
  private[osm] def unescape(c: Column): Column = {
    val q = regexp_replace(c, "&quot;", "\"")
    val ap = regexp_replace(q, "&apos;", "'")
    val gt = regexp_replace(ap, "&gt;", ">")
    val lt = regexp_replace(gt, "&lt;", "<")
    regexp_replace(lt, "&amp;", "&")
  }

  private[osm] def attr(el: Column, name: String): Column = {
    val raw = regexp_extract(el, s"""\\b$name="([^"]*)"""", 1)
    unescape(raw)
  }

  /** version attribute, defaulting to 1 when absent (e.g. fresh
    * creates in .osc files). */
  private[osm] def versionOf(el: Column): Column =
    when(regexp_extract(el, """\bversion="([^"]*)"""", 1) === "", lit(1))
      .otherwise(regexp_extract(el, """\bversion="([^"]*)"""", 1).cast("int"))

  private val TagRx = """<tag k="([^"]*)" v="([^"]*)""""

  private[osm] def tagsOf(el: Column): Column =
    map_from_arrays(
      transform(regexp_extract_all(el, lit(TagRx), lit(1)), k => unescape(k)),
      transform(regexp_extract_all(el, lit(TagRx), lit(2)), v => unescape(v)))

  /** One row per complete `<elem …>` element (column `el` holds the
    * element's full XML text, end tag stripped for the open form). */
  private def elements(spark: SparkSession, path: String, elem: String): DataFrame = {
    val chunks = spark.read.option("lineSep", s"</$elem>").text(path)
    val selfClosing = regexp_extract_all(col("value"), lit(s"(?s)<$elem\\b[^>]*/>"), lit(0))
    // greedy prefix → capture starts at the LAST `<elem` of the chunk:
    // that is the one open element whose end tag ended this record
    val lastFrag = regexp_extract(col("value"), s"(?s)^.*(<$elem\\b.*)$$", 1)
    val openFrag = filter(
      array(lastFrag),
      f => f =!= "" && !regexp_extract(f, s"(?s)^<$elem\\b[^>]*>", 0).endsWith("/>"))
    chunks
      .select(explode(concat(selfClosing, openFrag)).as("el"))
  }

  /** All `<node>` elements as the typed model (lat/lon degrees). */
  def nodes(spark: SparkSession, path: String): Dataset[OsmModel.Node] = {
    val s = spark; import s.implicits._
    elements(spark, path, "node")
      .select(
        attr(col("el"), "id").cast("long").as("id"),
        versionOf(col("el")).as("version"),
        attr(col("el"), "lat").cast("double").as("lat"),
        attr(col("el"), "lon").cast("double").as("lon"),
        tagsOf(col("el")).as("tags"))
      .as[OsmModel.Node]
  }

  /** All `<way>` elements with their ordered `<nd ref>` lists. */
  def ways(spark: SparkSession, path: String): Dataset[OsmModel.Way] = {
    val s = spark; import s.implicits._
    elements(spark, path, "way")
      .select(
        attr(col("el"), "id").cast("long").as("id"),
        versionOf(col("el")).as("version"),
        transform(regexp_extract_all(col("el"), lit("""<nd ref="([^"]*)""""), lit(1)),
          r => r.cast("long")).as("nds"),
        tagsOf(col("el")).as("tags"))
      .as[OsmModel.Way]
  }

  /** All `<relation>` elements with ordered member lists. */
  def relations(spark: SparkSession, path: String): Dataset[OsmModel.Relation] = {
    val s = spark; import s.implicits._
    val memRx = """<member type="([^"]*)" ref="([^"]*)" role="([^"]*)""""
    elements(spark, path, "relation")
      .select(
        attr(col("el"), "id").cast("long").as("id"),
        versionOf(col("el")).as("version"),
        zip_with(
          transform(regexp_extract_all(col("el"), lit(memRx), lit(2)), r => r.cast("long")),
          zip_with(
            transform(regexp_extract_all(col("el"), lit(memRx), lit(1)), m => unescape(m)),
            transform(regexp_extract_all(col("el"), lit(memRx), lit(3)), r => unescape(r)),
            (m, r) => struct(m.as("mtype"), r.as("role"))),
          (ref, mr) => struct(ref.as("ref"), mr.getField("mtype").as("mtype"), mr.getField("role").as("role"))
        ).as("members"),
        tagsOf(col("el")).as("tags"))
      .as[OsmModel.Relation]
  }

  /** The reference's `_get_way_node_map` (generator.py:35-53) off a
    * real `.osm` file: way id → ordered node-ref rows. */
  def wayNodeMap(spark: SparkSession, path: String): DataFrame =
    ways(spark, path).toDF()
      .select(col("id").as("way"), posexplode(col("nds")).as(Seq("pos", "node")))

  /** The reference's `_get_max_ids` (__main__.py:26-53) off a real
    * `.osm` file: max id per element type. */
  def maxIds(spark: SparkSession, path: String): DataFrame = {
    val n = nodes(spark, path).toDF().agg(max("id").as("max_id")).withColumn("elem_type", lit("node"))
    val w = ways(spark, path).toDF().agg(max("id").as("max_id")).withColumn("elem_type", lit("way"))
    val r = relations(spark, path).toDF().agg(max("id").as("max_id")).withColumn("elem_type", lit("relation"))
    n.unionByName(w).unionByName(r).select("elem_type", "max_id")
  }
}
