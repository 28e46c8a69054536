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

  /** `"((?:[^"\\]|\\.)*)"` twice around `=>`: a quoted-pair regex that
    * admits backslash-escaped quotes/backslashes inside keys and
    * values. Group 1 = key, group 2 = value (both still escaped). */
  private val HstorePairRx = """"((?:[^"\\]|\\.)*)"\s*=>\s*"((?:[^"\\]|\\.)*)""""

  /** Parse a Postgres hstore literal (`"k"=>"v", "k2"=>"v2"`) into a
    * map — the semantics of db.py:7-25 but robust where the
    * reference's global quote-strip is not: values containing `,` or
    * `=>` or backslash-escaped quotes parse correctly (pairs are
    * pulled by [[HstorePairRx]], not by splitting on bare commas).
    * Duplicate keys keep the LAST occurrence (Python `dict()` rule).
    * Unquoted `NULL` values are not represented (the reference drops
    * them too). Empty/blank input → empty map; null input → null.
    */
  def hstoreToMap(c: Column): Column = {
    import graft.ColumnOps.let
    def unesc(s: Column): Column = regexp_replace(s, """\\(.)""", "$1")
    let(regexp_extract_all(c, lit(HstorePairRx), lit(1))) { ks =>
      let(regexp_extract_all(c, lit(HstorePairRx), lit(2))) { vs =>
        // last-occurrence-wins: keep index i only if its key never
        // recurs later (all arrays are small — tag maps)
        val n = size(ks)
        val idx = when(n === 0, array().cast("array<int>"))
          .otherwise(sequence(lit(1), n))
        let(filter(idx, i => !exists(slice(ks, i + 1, n), k2 => k2 === element_at(ks, i)))) { keep =>
          map_from_arrays(
            transform(keep, i => unesc(element_at(ks, i))),
            transform(keep, i => unesc(element_at(vs, i))))
        }
      }
    }
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
