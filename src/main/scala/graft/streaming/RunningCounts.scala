package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

/** Per-user cumulative event count. */
final case class UserCount(user_id: Long, n_events: Long)

/** transformWithState (Spark 4's arbitrary-state API, the successor of
  * flatMapGroupsWithState): a ValueState[Long] per user accumulates counts
  * across micro-batches; each batch emits the updated total. State is typed,
  * per-key, RocksDB-backed (provider set by the caller/session), and can
  * carry TTL — here NONE because the count is a lifetime aggregate. */
class RunningCountProcessor extends StatefulProcessor[Long, (Long, Long), UserCount] {
  @transient private var count: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    count = getHandle.getValueState[Long]("count", Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
                               timers: TimerValues): Iterator[UserCount] = {
    val prev = if (count.exists()) count.get() else 0L
    val n = prev + rows.size
    count.update(n)
    Iterator.single(UserCount(key, n))
  }
}

object RunningCounts {
  /** events(user_id, …) stream → per-user cumulative counts, one emission
    * per user per micro-batch. Requires the RocksDB state store provider. */
  def perUser(events: DataFrame): Dataset[UserCount] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id").cast("long"), col("event_id").cast("long"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .transformWithState(new RunningCountProcessor,
        TimeMode.None(), OutputMode.Append(), Encoders.product[UserCount])
  }
}
