package graft.transform

import scala.util.{Failure, Success, Try}

/** Per-market failure isolation — the reference processes its market list
  * in a loop, records each failure, and continues with the remaining
  * markets rather than aborting the run
  * (transform/esios_transform.py:585-633). Same contract here: run every
  * market's pipeline closure (construction AND its actions — with lazy
  * Spark plans a bad market usually only fails at its write/count), keep
  * the successes, report the failures.
  */
object MarketRunner {

  final case class MarketStatus(processed: Seq[String],
      failed: Map[String, String]) {
    /** Mirrors the reference's overall_success: no failures and at least
      * one market actually produced data.
      */
    def success: Boolean = failed.isEmpty && processed.nonEmpty
  }

  def run[T](markets: Seq[String])(f: String => T): (Map[String, T], MarketStatus) = {
    val attempts = markets.map(m => m -> Try(f(m)))
    val ok = attempts.collect { case (m, Success(v)) => m -> v }
    val bad = attempts.collect { case (m, Failure(e)) =>
      m -> Option(e.getMessage).getOrElse(e.getClass.getName)
    }
    (ok.toMap, MarketStatus(ok.map(_._1), bad.toMap))
  }
}
