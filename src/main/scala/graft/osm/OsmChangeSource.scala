package graft.osm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** OsmChange (`.osc` / `.osc.gz`) READER + APPLIER — the inverse of
  * [[OsmChangeXml]], closing the reference's loop: changegen's whole
  * purpose is producing changefiles that a downstream `osmosis
  * --read-xml-change --apply-change` merges into a snapshot
  * (README: "apply with osmosis"). This is that consumer, Spark-side,
  * so a pipeline can diff → write → ship → APPLY → re-diff entirely
  * inside the engine, and the writer/reader/applier coherence is
  * property-testable (write(x) |> parse |> apply == expected).
  *
  * Parsing splits records on each section's END tag (the
  * [[OsmXmlSource.elements]] lineSep trick, lifted one level): the
  * text after the LAST `<create|modify|delete>` open tag of a chunk
  * is exactly one section body, and element regexes run inside it —
  * so the ACTION attribution that per-element splitting loses is
  * kept. Change files are diff-sized (≪ the snapshots they apply
  * to); the parallel-scaling side of an apply is the SNAPSHOT join,
  * which is a plain id-keyed equi-join here.
  */
object OsmChangeSource {

  /** One row per `<action>` section body found under `path`. */
  private def sections(spark: SparkSession, path: String, action: String): DataFrame =
    spark.read.option("lineSep", s"</$action>").text(path)
      .select(regexp_extract(col("value"), s"(?s)^.*<$action\\b[^>]*>(.*)$$", 1).as("body"))
      .filter(col("body") =!= "")

  private def elementsIn(body: Column, elem: String): Column =
    regexp_extract_all(body, lit(s"(?s)<$elem\\b[^>]*(?:/>|>.*?</$elem>)"), lit(0))

  /** All `<node>` elements with their enclosing action:
    * (action, id, version, lat, lon, tags). */
  def nodeActions(spark: SparkSession, path: String): DataFrame =
    Seq("create", "modify", "delete").map { a =>
      sections(spark, path, a)
        .select(explode(elementsIn(col("body"), "node")).as("el"))
        .select(lit(a).as("action"),
          OsmXmlSource.attr(col("el"), "id").cast("long").as("id"),
          OsmXmlSource.versionOf(col("el")).as("version"),
          OsmXmlSource.attr(col("el"), "lat").cast("double").as("lat"),
          OsmXmlSource.attr(col("el"), "lon").cast("double").as("lon"),
          OsmXmlSource.tagsOf(col("el")).as("tags"))
    }.reduce(_ unionByName _)

  /** All `<way>` elements with their enclosing action:
    * (action, id, version, nds, tags). */
  def wayActions(spark: SparkSession, path: String): DataFrame =
    Seq("create", "modify", "delete").map { a =>
      sections(spark, path, a)
        .select(explode(elementsIn(col("body"), "way")).as("el"))
        .select(lit(a).as("action"),
          OsmXmlSource.attr(col("el"), "id").cast("long").as("id"),
          OsmXmlSource.versionOf(col("el")).as("version"),
          transform(regexp_extract_all(col("el"), lit("""<nd ref="([^"]*)""""), lit(1)),
            r => r.cast("long")).as("nds"),
          OsmXmlSource.tagsOf(col("el")).as("tags"))
    }.reduce(_ unionByName _)

  /** Apply node actions to a base node snapshot — osmosis
    * `--apply-change` semantics: delete removes the id, modify
    * replaces it, create inserts it (upsert — robust to re-applied
    * shards). If an id appears under several actions across shards,
    * delete wins, then the highest-version modify/create row (a
    * deterministic total order, keepBest idiom — no struct-max
    * SortAggregate).
    *
    * `base` must carry (id, version, lat, lon, tags); output has the
    * same shape. One id-keyed equi-join against the diff-sized change
    * set — the snapshot never shuffles more than that.
    */
  def applyNodes(base: DataFrame, actions: DataFrame): DataFrame = {
    val ranked = actions.select(col("id"),
      (when(col("action") === "delete", 2L).otherwise(1L) * 4294967296L +
        col("version")).as("k"),
      when(col("action") === "delete", 2L).otherwise(1L).as("arank"),
      col("version"), col("lat"), col("lon"), col("tags"))
    // per-id winner via a row_number window over the DIFF-sized change
    // set (an agg-based keepBest would have to aggregate the map-typed
    // tags column, which falls back to SortAggregate)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("id")
      .orderBy(col("k").desc, col("lat"), col("lon"))
    val eff = ranked.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
    base.join(eff.select(col("id")), Seq("id"), "left_anti")
      .unionByName(eff.filter(col("arank") === 1L)
        .select("id", "version", "lat", "lon", "tags"))
  }
}
