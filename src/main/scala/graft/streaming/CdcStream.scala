package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming twin of the batch CDC compaction (`src_cdc_apply`'s
  * latest-wins stage in graft.queries.Pipeline): a changelog stream
  * of (key, packed) rows compacts to the current winner per key with
  * `flatMapGroupsWithState`.
  *
  * The packed long is the SAME encoding the batch query verifies
  * against DuckDB — (seq·2³⁵ + cents)·4 + op rank, ·4 + flag rank —
  * so it both totally orders a key's changes and embeds the winning
  * payload; state per key is therefore ONE long (8 bytes, sharded by
  * the groupByKey shuffle — the smallest possible CDC state).
  *
  * Each micro-batch emits an upsert row ONLY when a key's winner
  * advances: the output is the minimal MERGE stream a serving-table
  * sink applies. Late/duplicate/regressed changes (packed ≤ current)
  * emit nothing — replays are absorbed by the monotonic state, which
  * is what makes the sink idempotent end-to-end. No timeout: a key's
  * latest value stays applicable forever (a retention policy would
  * add ProcessingTimeTimeout and drop keys cold past the horizon).
  */
object CdcStream {

  case class Chg(key: Long, packed: Long)
  case class CdcState(p: Long)
  case class Upsert(key: Long, packed: Long, op: String, status: String, total_c: Long)

  /** Decode the packed change back to its op + payload (the inverse
    * of the batch query's encoder — kept bit-identical). */
  def decode(key: Long, p: Long): Upsert = {
    val op = (p / 4 % 4) match { case 0 => "D"; case 1 => "U"; case _ => "I" }
    val st = (p % 4) match { case 0 => "A"; case 1 => "N"; case _ => "R" }
    Upsert(key, p, op, st, p / 16 % 34359738368L)
  }

  def latestUpserts(chg: Dataset[Chg]): Dataset[Upsert] = {
    implicit val stEnc = Encoders.product[CdcState]
    implicit val outEnc = Encoders.product[Upsert]
    implicit val keyEnc = Encoders.scalaLong
    chg.groupByKey(_.key)
      .flatMapGroupsWithState[CdcState, Upsert](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[Chg], state) =>
          val incoming = rows.map(_.packed).max
          val prev = state.getOption.map(_.p)
          if (prev.forall(incoming > _)) {
            state.update(CdcState(incoming))
            Iterator.single(decode(key, incoming))
          } else Iterator.empty
      }
  }
}
