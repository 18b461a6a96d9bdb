package graft.link

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TrackingSpec extends SparkSpec {
  import spark.implicits._

  test("change log: new, obsolete, updated and unchanged entities") {
    val previous = Seq(
      ("U1", "OwnerA", 10),  // unchanged
      ("U2", "OwnerB", 20),  // owner changes
      ("U3", "OwnerC", 30))  // disappears ⇒ obsoleta
      .toDF("uof", "owner", "cap")
    val current = Seq(
      ("U1", "OwnerA", 10),
      ("U2", "OwnerZ", 20),
      ("U4", "OwnerD", 40))  // appears ⇒ habilitada
      .toDF("uof", "owner", "cap")
    val log = Tracking.changeLog(current, previous, "uof",
        Seq("owner", "cap"), lit("2024-07-15"))
      .select("uof", "field_changed", "old_value", "new_value")
      .as[(String, String, String, String)].collect().toSet
    assert(log == Set(
      ("U2", "owner", "OwnerB", "OwnerZ"),
      ("U3", "obsoleta", "false", "true"),
      ("U4", "habilitada", "false", "true")))
  }

  test("change log: null-safe attribute comparison") {
    val previous = Seq(("U1", Option.empty[String]), ("U2", Some("x")))
      .toDF("uof", "owner")
    val current = Seq(("U1", Option.empty[String]), ("U2", Option.empty[String]))
      .toDF("uof", "owner")
    val log = Tracking.changeLog(current, previous, "uof",
        Seq("owner"), lit("2024-07-15"))
      .select("uof", "field_changed").as[(String, String)].collect().toSet
    // null == null is NOT a change; x → null IS
    assert(log == Set(("U2", "owner")))
  }
}
