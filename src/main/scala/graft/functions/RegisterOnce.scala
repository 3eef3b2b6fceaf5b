package graft.functions

import java.util.Collections
import java.util.WeakHashMap

import org.apache.spark.sql.SparkSession

/** Once-per-session guard for the lazy Column-API registration path.
  *
  * The Column helpers (`ArrayMath.dot`, `TextExprs.simhash32`, …) register
  * their Catalyst expression in the session's function registry on first
  * use; without a guard every call re-registers and Spark logs a
  * `SimpleFunctionRegistry … replaced a previously registered function`
  * warning per call — hundreds of lines per bench run. Each family guards
  * with `RegisterOnce(family)(register)`: the registration runs once per
  * (SparkSession, family). Keys are held weakly so discarded sessions
  * don't pin memory in long-lived JVMs. Sessions built with
  * [[graft.GraftExtensions]] never hit this path at all.
  */
private[functions] object RegisterOnce {
  private val done =
    Collections.synchronizedMap(new WeakHashMap[SparkSession, java.util.Set[String]]())

  def apply(family: String)(register: SparkSession => Unit): Unit =
    SparkSession.getActiveSession.foreach { s =>
      val families = done.synchronized {
        var set = done.get(s)
        if (set == null) { set = Collections.synchronizedSet(new java.util.HashSet[String]()); done.put(s, set) }
        set
      }
      // Hold the set's lock across add+register: a losing thread blocks here
      // until the winner's register(s) completes, so it can never reach
      // call_function before the function exists (transient "undefined
      // function" analysis failure otherwise).
      families.synchronized {
        if (families.add(family)) register(s)
      }
    }
}
