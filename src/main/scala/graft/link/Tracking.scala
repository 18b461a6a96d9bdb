package graft.link

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dimension change tracking — the persistence companion of the J7 snapshot
  * diff (tracking/UOF_tracking.py:248-412): compare the current entity
  * snapshot against the stored dimension and emit one change-log row per
  * detected change, the reference's exact row shape:
  * (key, field_changed, old_value, new_value, date_updated).
  *
  * New entities log habilitada false→true, vanished ones obsoleta
  * false→true, and surviving entities one row per attribute whose value
  * differs (null-safe). One full-outer join + an exploded per-field
  * comparison — no driver-side iteration, scales with |entities|.
  */
object Tracking {

  def changeLog(current: DataFrame, previous: DataFrame, keyCol: String,
      attrCols: Seq[String], dateUpdated: Column): DataFrame = {
    // attributes compared as strings so one log schema fits every field
    // type (the reference stores old/new values as text)
    val cur = current.select(
      (col(keyCol).as("__k") +:
        attrCols.map(c => col(c).cast(StringType).as(s"__c_$c"))) :+
        lit(true).as("__in_c"): _*)
    val prev = previous.select(
      (col(keyCol).as("__k") +:
        attrCols.map(c => col(c).cast(StringType).as(s"__p_$c"))) :+
        lit(true).as("__in_p"): _*)
    val j = cur.join(prev, Seq("__k"), "full_outer")
    def chg(f: Column, o: Column, n: Column) = struct(
      f.as("field_changed"), o.as("old_value"), n.as("new_value"))
    val newRow = when(col("__in_p").isNull,
      chg(lit("habilitada"), lit("false"), lit("true")))
    val obsRow = when(col("__in_c").isNull,
      chg(lit("obsoleta"), lit("false"), lit("true")))
    val updRows = attrCols.map { c =>
      when(col("__in_c").isNotNull && col("__in_p").isNotNull &&
        !(col(s"__c_$c") <=> col(s"__p_$c")),
        chg(lit(c), col(s"__p_$c"), col(s"__c_$c")))
    }
    val changes = filter(array(newRow +: obsRow +: updRows: _*), _.isNotNull)
    j.select(col("__k").as(keyCol), explode(changes).as("__ch"))
      .select(col(keyCol), col("__ch.field_changed").as("field_changed"),
        col("__ch.old_value").as("old_value"),
        col("__ch.new_value").as("new_value"),
        dateUpdated.as("date_updated"))
  }
}
