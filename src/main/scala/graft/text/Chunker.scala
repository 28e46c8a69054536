package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Token-window document chunking — the context-window preparation
  * step of an LLM training/RAG pipeline: split each document into
  * overlapping windows of `window` tokens advancing by `stride`
  * (overlap = window - stride).
  *
  * Pure narrow map (explode only, no shuffle): at 100 TB this runs
  * embarrassingly parallel and chunk counts scale with input size,
  * never with corpus size. Chunk starts are `0, stride, 2*stride, …`
  * while the start lands inside the document, so every token is
  * covered and the final (possibly short) window is kept.
  */
object Chunker {

  /** One row per chunk: (idCol, chunk_id, n_tokens, chunk_text). */
  def chunk(df: DataFrame, idCol: String, textCol: String,
            window: Int = 32, stride: Int = 24): DataFrame = {
    require(stride > 0 && window >= stride, "need 0 < stride <= window")
    df.select(col(idCol),
        posexplode(graft.ColumnOps.let(TextAnalysis.tokens(col(textCol))) { toks =>
          transform(
            sequence(lit(0), greatest(size(toks) - 1, lit(0)), lit(stride)),
            s => slice(toks, s + 1, lit(window)))
        }).as(Seq("chunk_id", "_chunk")))
      .select(col(idCol), col("chunk_id").cast("long"),
        size(col("_chunk")).cast("long").as("n_tokens"),
        concat_ws(" ", col("_chunk")).as("chunk_text"))
  }

  /** CONTENT-DEFINED chunking (rsync/LBFS-style): a position `i` is a
    * cut when the hash of the `window`-char run ending at `i` is
    * ≡ 0 mod `divisor` (avg chunk ≈ divisor chars). Boundaries are a
    * pure function of LOCAL content, so inserting or deleting a
    * prefix shifts which absolute offsets cut but re-synchronizes on
    * the same content — the property that lets chunk-hash dedup catch
    * shifted duplicates where fixed-offset chunking never re-aligns
    * ([[chunk]] shifts every window forever after an insert).
    *
    * The window hash is md5 of the char run — independently
    * computable per position (one `transform` over the index range:
    * narrow, codegen'd, no rolling state), and exactly replicable in
    * the DuckDB oracle, unlike a gear/rabin rolling register.
    *
    * Output: (idCol, chunk_id, n_chars_chunk, chunk_hash) —
    * chunk_hash = md5(chunk text), the dedup key. Zero shuffles.
    */
  def cdcChunk(df: DataFrame, idCol: String, textCol: String,
               window: Int = 8, divisor: Int = 64): DataFrame = {
    require(window >= 1 && divisor >= 1)
    // bounds = 0 ++ cuts ++ n from the native one-pass cut finder
    // (graft.functions.CdcCutsExpr — the HOF twin below evaluates a
    // full md5 + hex + conv chain per char position, ~10× the cost);
    // slicing the ≤ n/divisor chunks stays composable
    val chunksArr = graft.ColumnOps.let(col(textCol)) { txt =>
      graft.ColumnOps.let(
        call_function("graft_cdc_cuts", txt, lit(window), lit(divisor))) { bounds =>
        transform(
          sequence(lit(0), size(bounds) - 2),
          j => txt.substr(element_at(bounds, j + 1) + 1,
            element_at(bounds, j + 2) - element_at(bounds, j + 1)))
      }
    }
    explodeChunks(df, idCol, chunksArr)
  }

  /** The composable higher-order-function twin of [[cdcChunk]] — the
    * same cut rule as per-position `md5`/`conv` expressions. Kept as
    * the bit-equality witness for the native cut finder (spec-tested
    * equal row-for-row) and as the form the DuckDB oracle mirrors.
    */
  def cdcChunkHof(df: DataFrame, idCol: String, textCol: String,
                  window: Int = 8, divisor: Int = 64): DataFrame = {
    require(window >= 1 && divisor >= 1)
    // the chunks ARRAY builds inside let-bound lambdas (text + length
    // evaluate once); the generator itself must stay top-level in the
    // select, so posexplode wraps the let rather than living in it
    val chunksArr = graft.ColumnOps.let(col(textCol)) { txt =>
      graft.ColumnOps.let(length(txt)) { n =>
        // cut positions: window-aligned probes strictly inside the
        // text; bounds = 0 ++ cuts ++ n delimit the chunks
        val cuts = filter(
          when(n >= window + 1, sequence(lit(window), n - 1)).otherwise(array().cast("array<int>")),
          i => conv(substring(md5(txt.substr(i - lit(window) + 1, lit(window))), 1, 8), 16, 10)
            .cast("long") % divisor === 0)
        graft.ColumnOps.let(concat(array(lit(0)), cuts, array(n))) { bounds =>
          transform(
            sequence(lit(0), size(bounds) - 2),
            j => txt.substr(element_at(bounds, j + 1) + 1,
              element_at(bounds, j + 2) - element_at(bounds, j + 1)))
        }
      }
    }
    explodeChunks(df, idCol, chunksArr)
  }

  /** Shared tail: explode the chunk array to (id, chunk_id,
    * n_chars_chunk, chunk_hash) rows, dropping the single empty chunk
    * an empty document produces. */
  private def explodeChunks(df: DataFrame, idCol: String,
                            chunksArr: Column): DataFrame =
    df.select(col(idCol), posexplode(chunksArr).as(Seq("chunk_id", "_chunk")))
      .filter(length(col("_chunk")) > 0)
      .select(col(idCol), col("chunk_id").cast("long"),
        length(col("_chunk")).cast("long").as("n_chars_chunk"),
        md5(col("_chunk")).as("chunk_hash"))
}
