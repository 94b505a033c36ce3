package graft.streaming

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared text encoding for grouping keys flowing into
  * transformWithState processors (which key by a single string).
  *
  * Single keys cast to string directly. Composite keys encode as
  * `to_json(struct(cols))`: field names keep the components positional
  * and null components distinguishable (a null field is omitted UNDER
  * ITS NAME, so ("a", null) gives {"c1":"a"} and (null, "a") gives
  * {"c2":"a"} — never a collision), and JSON string escaping makes the
  * encoding collision-free for ARBITRARY component values, including
  * values containing whatever separator byte an ad-hoc concat_ws codec
  * would rely on (the round-13 review found exactly that residual
  * collision: with a u0001 separator, ("a" u0001 "b", "c") and
  * ("a", "b" u0001 "c") encoded identically).
  */
private[streaming] object StreamKeys {
  def text(keyCols: Seq[String]): Column =
    if (keyCols.lengthCompare(1) == 0) col(keyCols.head).cast("string")
    else to_json(struct(keyCols.map(col): _*))
}
