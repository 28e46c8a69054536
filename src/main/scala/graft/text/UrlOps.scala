package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for web-corpus dedup (the Common-Crawl-style
  * pre-dedup step: a page's many spellings collapse to one key).
  *
  * Entirely codegen'd column expressions — regexp_extract/replace,
  * string replace, and HOF filter/sort over the query params. All
  * regexes are RE2-safe and NO replacement uses backreferences (Spark
  * writes `$1` where DuckDB writes `\1` — avoiding them keeps the
  * oracle bit-identical), so the same normalization replicates in SQL.
  *
  * Steps: drop fragment → lowercase scheme://host[:port] → strip
  * literal `www.` → strip default ports (`:443` for https, `:80` for
  * http) → strip trailing path slashes → drop `utm_*` tracking params
  * and sort the survivors.
  */
object UrlOps {

  /** Canonical form of a URL column. */
  def normalizeUrl(url: Column): Column = {
    // fragment never participates
    graft.ColumnOps.let(regexp_replace(url, "#.*$", "")) { u =>
      // scheme://host[:port] prefix; rest = path[?query]
      graft.ColumnOps.let(regexp_extract(u, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", 0)) { pre0 =>
        graft.ColumnOps.let(u.substr(length(pre0) + 1, lit(1000000))) { rest =>
          val lowered = lower(pre0)
          // anchored www. strip — scheme spelled out so no backref
          val noWww = regexp_replace(
            regexp_replace(lowered, "^https://www\\.", "https://"),
            "^http://www\\.", "http://")
          val noPort = when(noWww.startsWith("https://"), regexp_replace(noWww, ":443$", ""))
            .otherwise(regexp_replace(noWww, ":80$", ""))
          val path = regexp_extract(rest, "^[^?]*", 0)
          val qs = regexp_extract(rest, "^[^?]*\\?(.*)$", 1)
          val pathNorm = regexp_replace(path, "/+$", "")
          val params = array_sort(filter(split(qs, "&"),
            p => !p.startsWith("utm_") && p =!= ""))
          concat(noPort, pathNorm,
            when(size(params) > 0, concat(lit("?"), array_join(params, "&"))).otherwise(lit("")))
        }
      }
    }
  }
}
