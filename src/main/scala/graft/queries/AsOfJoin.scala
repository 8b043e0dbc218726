package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Left as-of join (point-in-time join): for each left row, attach the
  * single right row with the greatest `rightTime <= leftTime` in the same
  * key group — the "state of the world as of this event" lookup that
  * time-series engines ship natively (DuckDB `ASOF JOIN`, kdb+ `aj`,
  * Pandas `merge_asof`). Spark has no built-in, and the naive encodings
  * both collapse at 100 TB:
  *
  *  - `l JOIN r ON l.key = r.key AND r.t <= l.t` + argmax: the inequality
  *    conjunct makes the join produce every (left, earlier-right) pair
  *    before the argmax prunes — quadratic in rows-per-key;
  *  - a broadcast nested-loop on the time predicate: quadratic AND
  *    single-node.
  *
  * The scale-safe shape is a TAGGED UNION + one window pass:
  *
  *   1. project right to (keys, time, payload-struct), tag side=0;
  *      union-by-name with left tagged side=1 — columns the other side
  *      lacks are null;
  *   2. one window over `partitionBy(keys).orderBy(time, side)` computes
  *      `last(payload, ignoreNulls=true)` from unbounded-preceding to
  *      current row — each left row sees exactly the latest right payload
  *      at-or-before its time (side 0 < side 1 makes an equal-time right
  *      row visible, i.e. the boundary is inclusive);
  *   3. keep side=1 rows, unpack the struct.
  *
  * Cost: ONE hash exchange on `keys` + a per-group sort, identical to any
  * windowed cleaning pass over the same data — no row amplification, no
  * driver participation, state per group bounded by one payload struct.
  * The payload rides in a single struct so all its fields come from the
  * SAME matched row (per-column `last(ignoreNulls)` could mix rows when
  * right-side fields are themselves null).
  *
  * Determinism: callers must make (keys, rightTime) unique (pre-aggregate
  * ties, as `j8_asof_join` does with max(event_id) per instant) — with
  * duplicate right timestamps "the" latest row is not well defined in any
  * as-of engine.
  */
object AsOfJoin {

  /** @param rightCols payload columns of `right` to carry onto matches;
    *                  emitted as `prefix<name>`, plus `prefix<rightTime>`
    *                  for the matched row's timestamp. Nulls when the left
    *                  row has no at-or-before match. */
  def asOfLeft(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, rightCols: Seq[String],
      prefix: String = "asof_"): DataFrame = {
    val payloadFields = rightTime +: rightCols
    val r = right
      .select((keys :+ rightTime).map(col) :+
        struct(payloadFields.map(col): _*).as("__asof_payload"): _*)
      .withColumnRenamed(rightTime, "__asof_t")
      .withColumn("__asof_side", lit(0))
    val l = left
      .withColumn("__asof_t", col(leftTime))
      .withColumn("__asof_side", lit(1))
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("__asof_t"), col("__asof_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = l.unionByName(r, allowMissingColumns = true)
      .withColumn("__asof_match", last(col("__asof_payload"), ignoreNulls = true).over(w))
      .filter(col("__asof_side") === 1)
    matched.select(left.columns.toIndexedSeq.map(col) ++
      payloadFields.map(n => col(s"__asof_match.`$n`").as(s"$prefix$n")): _*)
  }
}
