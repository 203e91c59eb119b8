package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** The co-located join strategy for repeated big joins at scale
  * (SURVEY §2.7 / the 100 TB posture): bucket both fact tables on the
  * join key at write time, and the sort-merge join needs no shuffle
  * at read time — Catalyst sees compatible HashClusteredDistributions
  * from the bucket metadata.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed-by-key join plans without a shuffle exchange") {
    val s = spark // getOrCreate would return this session anyway
    val prevThreshold = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = s.conf.get("spark.sql.adaptive.enabled")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    // AQE wraps the plan in AdaptiveSparkPlanExec, hiding exchanges
    // from plan.collect — disable it so the no-shuffle assertion bites
    s.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // drop any leftovers (managed-table locations survive crashes)
      Seq("li_bucketed", "o_bucketed").foreach { t =>
        s.sql(s"DROP TABLE IF EXISTS $t")
        val loc = new java.io.File(
          s.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
        if (loc.exists()) {
          def rm(f: java.io.File): Unit = {
            if (f.isDirectory) f.listFiles().foreach(rm)
            f.delete(): Unit
          }
          rm(loc)
        }
      }
      val li = Tables.load(s, sfDir, "lineitem")
      val o = Tables.load(s, sfDir, "orders")
      li.write.mode("overwrite").bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey").saveAsTable("li_bucketed")
      o.write.mode("overwrite").bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey").saveAsTable("o_bucketed")

      val joined = s.table("li_bucketed")
        .join(s.table("o_bucketed"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(sum(col("l_quantity")).as("qty"))

      // correctness parity with the unbucketed join
      val expected = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus")).agg(sum(col("l_quantity")).as("qty"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val got = joined.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(got == expected)

      // the join itself must not shuffle: the only exchange allowed is
      // the one under the final aggregation
      val plan = joined.queryExecution.executedPlan
      val exchanges = plan.collect { case e: ShuffleExchangeExec => e }
      assert(exchanges.size <= 1,
        s"bucketed join should not shuffle its inputs:\n$plan")
    } finally {
      Seq("li_bucketed", "o_bucketed").foreach(t => s.sql(s"DROP TABLE IF EXISTS $t"))
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      s.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }
}
