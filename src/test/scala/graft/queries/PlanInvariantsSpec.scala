package graft.queries

import graft.SparkSpec

/** Global physical-plan invariants over EVERY gate query — the
  * 100 TB posture, asserted, not hoped: no CartesianProduct anywhere
  * (the q09 cross-join gate and the 1-row aggregate combines all
  * plan as BroadcastNestedLoopJoin over broadcast singletons, never a
  * partition-pair product), and no Python/eval rows (everything stays
  * JVM-codegen or typed kernels). Per-operator shuffle-count guards
  * live with their ops (t60, s51, DSv2); this spec is the fleet-wide
  * regression net so a refactor cannot quietly introduce the one join
  * shape that does not survive a scale-up.
  */
class PlanInvariantsSpec extends SparkSpec {

  test("no gate query plans a CartesianProduct or Python eval") {
    val offenders = graft.SparkEntry.all.flatMap { q =>
      val plan = q.run(spark, sfDir).queryExecution.executedPlan.toString
      val bad = Seq("CartesianProduct", "BatchEvalPython", "ArrowEvalPython")
        .filter(plan.contains)
      if (bad.isEmpty) None else Some(s"${q.name}: ${bad.mkString(",")}")
    }
    assert(offenders.isEmpty, offenders.mkString("; "))
  }
}
