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
}
