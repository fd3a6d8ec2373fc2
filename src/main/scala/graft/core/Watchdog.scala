package graft.core

import java.util.concurrent.atomic.AtomicReference
import org.apache.spark.sql.SparkSession

/** Per-query wall-clock budget for the driver-contract mains.
  *
  * Round-12 lesson: ONE pathological operator (an interpreted-HOF
  * regression in `repetitionStats`) hung `graft.Verify` at its first
  * affected query and `graft.Bench` at a warmup `.count()`, and the
  * round's ENTIRE correctness and bench artifacts were zeroed when the
  * driver killed the processes at their global budgets. A sweep over a
  * hundred-plus independent queries must degrade per-query, never
  * per-run.
  *
  * [[run]] executes an action on its own thread under a Spark job group
  * (`interruptOnCancel = true`) and, past the budget, cancels the group
  * — `SparkContext.cancelJobGroup` kills the action's running jobs, the
  * action thread unwinds with the cancellation exception, and the caller
  * records the timeout and CONTINUES to the next query. If the action
  * thread refuses to die within the grace period (a task wedged in a
  * non-interruptible loop — interrupts only reach code that checks
  * them), the daemon thread is abandoned: its orphaned tasks may keep
  * burning executor cores, which can slow later queries but cannot hang
  * the sweep or zero the artifact — the deliberate trade.
  *
  * Job groups are thread-local (inherited by jobs submitted FROM the
  * action thread), so concurrent watchdogs would not cross-cancel; the
  * mains run queries serially regardless (the [[Caches]] serial-session
  * contract).
  */
object Watchdog {

  /** Env-tunable per-query budget in seconds (default `dflt`, typically
    * 120 — generous for any healthy query at bench scale; sf1 sessions
    * export a larger one). */
  def budgetMs(dflt: Long = 120L): Long =
    sys.env.get("SPARK_GRAFT_QUERY_BUDGET_S").map(_.toLong).getOrElse(dflt) * 1000L

  // group ids are per-INVOCATION (the counter), not per-name:
  // cancelJobGroupAndFutureJobs marks a group id cancelled going forward,
  // and Bench re-runs the same query name (warm runs, second pass) — a
  // name-keyed group would insta-cancel every retry after one timeout
  private val seq = new java.util.concurrent.atomic.AtomicLong()

  /** Run `action` under `budgetMs`; Left(reason) on timeout or failure,
    * Right(value) on success. Never throws. */
  def run[A](spark: SparkSession, name: String, budgetMs: Long)(
      action: => A): Either[String, A] = {
    val group = s"graft-wd-$name-${seq.incrementAndGet()}"
    val result = new AtomicReference[Either[String, A]]()
    val t = new Thread(() => {
      spark.sparkContext.setJobGroup(group, name, interruptOnCancel = true)
      try result.set(Right(action))
      catch { case e: Throwable =>
        result.set(Left(s"${e.getClass.getSimpleName}: ${e.getMessage}"))
      }
      finally spark.sparkContext.clearJobGroup()
    }, s"graft-watchdog-$name")
    t.setDaemon(true)
    t.start()
    t.join(budgetMs)
    if (t.isAlive) {
      System.err.println(s"[watchdog] $name exceeded ${budgetMs / 1000}s — cancelling job group")
      // AndFutureJobs: a cancel can race job SUBMISSION (budget expiring
      // while the action is still planning) — plain cancelJobGroup would
      // then cancel nothing and the next submitted job would run to
      // completion anyway
      try spark.sparkContext.cancelJobGroupAndFutureJobs(group)
      catch { case _: Throwable => () }
      t.join(15000L) // grace: let the cancellation unwind the action thread
      Option(result.get).getOrElse(Left(s"timeout after ${budgetMs / 1000}s"))
    } else Option(result.get).getOrElse(Left("action thread died without a result"))
  }
}
