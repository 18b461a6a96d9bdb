package graft.link

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** UP↔UOF linking algorithm — SURVEY.md §2.3 J3-J6 + §3.4
  * (vinculacion/_linking_algorithm.py:82-748).
  *
  * Two entity universes (UP from I90, UOF from OMIE) are matched by the md5
  * of their hourly×market volume profile. The reference loops per entity
  * with asyncio; here profiles are one groupBy and matching is one hash
  * equi-join — embarrassingly parallel, shuffle keyed on the hash, no
  * driver-side iteration. Each round:
  *   1. exact profile-hash match where the hash is unique on both sides (J3)
  *   2. name-equality resolution of ambiguous hash groups (J4)
  *   3. optional historical (t−1) rematch of the unmatched remainder,
  *      anti-joined against already-matched entities (J5)
  *   4. conflict pruning: any uof matched to >1 up is dropped (J6)
  */
object Linking {

  /** Build per-entity profile hashes from (entity, id_mercado, hour, volumenes)
    * rows: hourly sums rounded to 2 decimals (ref :126-161), formatted
    * canonically, sorted, joined, md5'd (ref :175-280). Zero-volume cells
    * are excluded like the reference (ref :117-120).
    */
  def profileHashes(df: DataFrame, entityCol: String): DataFrame =
    df.filter(col("volumenes").isNotNull && col("volumenes") =!= 0)
      .groupBy(col(entityCol), col("id_mercado"), col("hour"))
      .agg(sum(col("volumenes").cast(DecimalType(18, 2))).as("v"))
      .filter(col("v") =!= 0)
      .select(col(entityCol).as("entity"),
        concat_ws(":", col("id_mercado"), col("hour"),
          col("v").cast(StringType)).as("cell"))
      .groupBy("entity")
      .agg(md5(array_join(sort_array(collect_list(col("cell"))), ",")).as("h"))

  /** J3+J4: hash join of the two universes; unique↔unique hashes are exact
    * matches, ambiguous groups resolve only where up == uof string-equal.
    */
  def matchRound(ups: DataFrame, uofs: DataFrame): DataFrame = {
    val a = ups.select(col("entity").as("up"), col("h"))
      .withColumn("na", count(lit(1)).over(Window.partitionBy("h")))
    val b = uofs.select(col("entity").as("uof"), col("h"))
      .withColumn("nb", count(lit(1)).over(Window.partitionBy("h")))
    a.join(b, "h")
      .withColumn("exact", col("na") === 1 && col("nb") === 1)
      .filter(col("exact") || col("up") === col("uof")) // J4 name resolution
      .select(col("up"), col("uof"), col("h"),
        when(col("exact"), "exact").otherwise("name").as("match_type"))
  }

  /** J6: drop every match whose uof (or up) appears more than once. */
  def pruneConflicts(matches: DataFrame): DataFrame =
    matches
      .withColumn("cu", count(lit(1)).over(Window.partitionBy("uof")))
      .withColumn("cp", count(lit(1)).over(Window.partitionBy("up")))
      .filter(col("cu") === 1 && col("cp") === 1)
      .drop("cu", "cp")

  /** Full two-round link: `today` frames keyed (entity, id_mercado, hour,
    * volumenes) for each universe; `yesterday` optional for the J5 rematch.
    */
  def link(upsToday: DataFrame, uofsToday: DataFrame,
      upsYesterday: Option[DataFrame] = None,
      uofsYesterday: Option[DataFrame] = None,
      entityCol: String = "entity"): DataFrame = {
    val r1 = matchRound(profileHashes(upsToday, entityCol),
      profileHashes(uofsToday, entityCol))
    val r2 = (upsYesterday, uofsYesterday) match {
      case (Some(uy), Some(oy)) =>
        // J5: rematch yesterday's profiles for entities not matched today
        val hu = profileHashes(uy, entityCol)
          .join(r1.select(col("up").as("entity")), Seq("entity"), "left_anti")
        val ho = profileHashes(oy, entityCol)
          .join(r1.select(col("uof").as("entity")), Seq("entity"), "left_anti")
        matchRound(hu, ho).withColumn("match_type",
          concat(lit("hist_"), col("match_type")))
      case _ => r1.limit(0)
    }
    pruneConflicts(r1.unionByName(r2))
  }
}
