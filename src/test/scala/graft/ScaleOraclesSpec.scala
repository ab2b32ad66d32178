package graft

import org.scalatest.funsuite.AnyFunSuite

/** Structural invariants of the staged large-SF oracle recipes — cheap
  * guards against a recipe that check.py --scale would misexecute.
  * (Result equivalence with the single-statement oracles is proven by
  * running the --scale gate at sf0.01/sf0.1 — see ScaleOracles scaladoc.) */
class ScaleOraclesSpec extends AnyFunSuite {

  test("every recipe names a declared gate query") {
    val unknown = ScaleOracles.all.keySet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"recipes without a gate query: $unknown")
  }

  test("recipes end in a result SELECT and use shard placeholders coherently") {
    ScaleOracles.all.foreach { case (name, steps) =>
      assert(steps.nonEmpty, s"$name: empty recipe")
      val last = steps.last
      assert(!last.perShard, s"$name: result statement must not be per-shard")
      val head = last.sql.trim.toUpperCase
      assert(head.startsWith("SELECT") || head.startsWith("WITH"),
        s"$name: last step must be the result SELECT")
      steps.dropRight(1).foreach { st =>
        val hasShard = st.sql.contains("__SHARD__")
        val hasN = st.sql.contains("__NSHARDS__")
        if (st.perShard)
          assert(hasShard && hasN,
            s"$name: per-shard step missing placeholders:\n${st.sql.take(120)}")
        else
          assert(!hasShard && !hasN,
            s"$name: non-shard step must not use placeholders:\n${st.sql.take(120)}")
      }
      // check.py drops temp tables by regexing CREATE ... TEMP TABLE —
      // a recipe relying on non-temp tables would leak across queries
      steps.dropRight(1).filter(_.sql.trim.toUpperCase.startsWith("CREATE"))
        .foreach(st => assert(st.sql.contains("TEMP TABLE"),
          s"$name: CREATE without TEMP TABLE:\n${st.sql.take(120)}"))
    }
  }
}
