package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.functions._

/** Differential + edge coverage for the native PqCodes quantizer (r16) —
  * the expression that replaced (a) the interpreted argminFold over
  * literal centroids (learned IVF/kmeans/semdedup assignment) and (b) the
  * explode×m + broadcast-join + hash-agg min(struct) PQ encode. The
  * reference below implements exactly those displaced semantics: per
  * subspace j, key(p) = ‖c_jp‖² − 2·(v_j·c_jp) with left-to-right dot
  * accumulation and left-assoc sum of squares, strict-< argmin in
  * ascending p order (ties keep the lowest p); the dot metric drops the
  * ‖c‖² term (argmax dot ≡ argmin −2·dot, ×−2 exact and order-reversing).
  */
class PqCodesSpec extends SparkSpec {
  import spark.implicits._

  private def pqCol(v: Column, cb: Array[Array[Array[Double]]],
      useL2: Boolean): Column =
    GraftColumnBridge.column(
      PqCodes(GraftColumnBridge.expression(v), cb, useL2))

  /** The displaced min(struct(key, p)) semantics, per subspace. */
  private def reference(v: Array[Double], cb: Array[Array[Array[Double]]],
      useL2: Boolean): Array[Int] =
    cb.zipWithIndex.map { case (book, j) =>
      val sub = book.head.length
      val base = j * sub
      var best = -1
      var bestKey = Double.PositiveInfinity
      for (p <- book.indices) {
        var dot = 0d
        val n = math.min(sub, math.max(0, v.length - base))
        for (i <- 0 until n) dot += v(base + i) * book(p)(i)
        var nc2 = 0d
        if (useL2) for (x <- book(p)) nc2 += x * x
        val key = nc2 - 2d * dot
        if (key < bestKey) { best = p; bestKey = key }
      }
      best
    }

  private val rnd = new scala.util.Random(421016)
  private def vec(n: Int): Array[Double] =
    Array.fill(n)(math.rint(rnd.nextDouble() * 200 - 100) / 10.0)

  test("randomized differential vs the displaced argmin semantics") {
    for (metric <- Seq(true, false); trial <- 1 to 5) {
      val m = 1 + rnd.nextInt(4)
      val sub = 1 + rnd.nextInt(5)
      val ksub = 2 + rnd.nextInt(6)
      val cb = Array.fill(m)(Array.fill(ksub)(vec(sub)))
      val vs = (0L until 64L).map(i => (i, vec(m * sub).toSeq)).toDF("id", "v")
        .withColumn("v", expr("transform(v, x -> CAST(x AS DOUBLE))"))
      val got = vs.select(col("id"), pqCol(col("v"), cb, metric).as("c"))
        .as[(Long, Seq[Int])].collect().toMap
      val raw = vs.as[(Long, Seq[Double])].collect().toMap
      for (i <- 0L until 64L) {
        val expect = reference(raw(i).toArray, cb, metric).toSeq
        assert(got(i) == expect, s"trial $trial metric=$metric id=$i")
      }
    }
  }

  test("ties keep the lowest position (both metrics)") {
    // duplicate codebook rows: every key ties, argmin must return 0
    val cb = Array(Array(Array(1.0, 2.0), Array(1.0, 2.0), Array(1.0, 2.0)))
    for (metric <- Seq(true, false)) {
      val out = Seq(Tuple1(Seq(3.0, 4.0))).toDF("v")
        .select(pqCol(col("v"), cb, metric).as("c"))
        .as[Seq[Int]].head()
      assert(out == Seq(0), s"metric=$metric tie not lowest position")
    }
  }

  test("null vector and null element yield NULL; short vectors truncate") {
    val cb = Array(Array(Array(1.0, 1.0), Array(-1.0, -1.0)))
    val df = Seq(
      (1L, Seq[java.lang.Double](2.0, 2.0)),
      (2L, null),
      (3L, Seq[java.lang.Double](2.0, null)),
      (4L, Seq[java.lang.Double](2.0)) // shorter than sub=2: dot truncates
    ).toDF("id", "v")
      .withColumn("v", expr("transform(v, x -> CAST(x AS DOUBLE))"))
      .select(col("id"), pqCol(col("v"), cb, useL2 = false).as("c"))
      .as[(Long, Seq[Int])].collect().toMap
    assert(df(1L) == Seq(0))
    assert(df(2L) == null)
    assert(df(3L) == null)
    // truncated dot: v·c0 = 2, v·c1 = −2 → argmax dot = position 0
    assert(df(4L) == Seq(0))
  }

  test("codegen and interpreted paths agree") {
    val cb = Array.fill(2)(Array.fill(3)(vec(4)))
    val vs = (0L until 32L).map(i => (i, vec(8).toSeq)).toDF("id", "v")
      .withColumn("v", expr("transform(v, x -> CAST(x AS DOUBLE))"))
    val c = pqCol(col("v"), cb, useL2 = true).as("c")
    val byCodegen = vs.select(col("id"), c).as[(Long, Seq[Int])]
      .collect().sortBy(_._1).toSeq
    val byInterp = withSQLConf(
      "spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      vs.select(col("id"), c).as[(Long, Seq[Int])].collect().sortBy(_._1).toSeq
    }
    assert(byCodegen == byInterp)
  }

  private def withSQLConf[A](kvs: (String, String)*)(f: => A): A = {
    val old = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
