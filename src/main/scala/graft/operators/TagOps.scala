package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Tag construction — Spark re-expression of the reference's
  * `_generate_tags_from_feature` (changegen/generator.py:169-205) and
  * `hstore_as_dict` (changegen/db.py:7-25).
  *
  * Tags are `Map[String,String]` columns built from (a) table columns
  * minus an exclude list and (b) an optional Postgres-hstore-formatted
  * string column, with table columns taking precedence on duplicate
  * keys — exactly the reference's merge rule.
  *
  * All of this is pure column expressions (codegen'd, no UDF).
  */
object TagOps {

  /** Map column from the given table columns, key = column name. Null
    * values become empty strings (OGR's GetFieldAsString behavior).
    */
  def tagsFromColumns(df: DataFrame, include: Seq[String], exclude: Seq[String] = Nil): Column = {
    val cols = include.filterNot(exclude.contains)
    map(cols.flatMap(c => Seq(lit(c), coalesce(col(c).cast("string"), lit("")))): _*)
  }

  /** Parse a Postgres hstore literal (`"k"=>"v", "k2"=>"v2"`) into a
    * map. Mirrors db.py:7-25 (split on `", `, strip quotes/space around
    * `=>`). Tolerates single- or double-quoted keys/values.
    */
  def hstoreToMap(c: Column): Column = {
    // normalize: strip quotes, then standard str_to_map on "," / "=>"
    // (whitespace-tolerant around both delimiters and at the ends)
    val cleaned = regexp_replace(trim(c), """["']""", "")
    when(length(trim(c)) === 0, map())
      .otherwise(str_to_map(cleaned, lit("\\s*,\\s*"), lit("\\s*=>\\s*")))
  }

  /** Column-precedence merge: keys of `primary` win over `secondary`
    * (reference: "columns take precedence", generator.py:174-176).
    */
  def mergeTags(primary: Column, secondary: Column): Column =
    map_concat(
      map_filter(secondary, (k, _) => !array_contains(map_keys(primary), k)),
      primary
    )

  /** Explode a tag map into sorted (key, value) rows for inspection /
    * verification (XML writers consume the map directly).
    */
  def explodeTags(df: DataFrame, tagCol: String, keyOut: String = "tag_key", valOut: String = "tag_value"): DataFrame =
    df.select(df.columns.map(col) :+ explode(col(tagCol)).as(Seq(keyOut, valOut)): _*)
      .drop(tagCol)
}
