package graft

/** One-shot maintenance check against a decade-scale index pair (the
  * ServingScaleProbe artifacts): attach the DEGRADED (legacy grain 64)
  * 1000× indexes and their re-grained compacts, print what
  * [[graft.queries.Maintenance]] recommends for each — the at-scale
  * validation that the decision function fires the grain rule exactly
  * where the measured fix was needed and is silent after it was applied.
  *
  * Usage: graft.MaintainProbe [workDir]  (default /tmp/graft_scale)
  */
object MaintainProbe {
  def main(args: Array[String]): Unit = {
    val work = args.headOption.getOrElse("/tmp/graft_scale")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def rec(kind: String, dir: String, pfx: String): Unit = {
      if (!new java.io.File(dir).exists()) { println(s"$pfx: absent"); return }
      if (kind == "text") {
        graft.queries.DedupIndex.attach(spark, dir, pfx)
        println(s"$pfx -> ${graft.queries.Maintenance.forText(spark, pfx)}")
      } else {
        graft.queries.VectorIndex.attach(spark, dir, pfx)
        println(s"$pfx -> ${graft.queries.Maintenance.forVectors(spark, pfx)}")
      }
    }
    rec("text", s"$work/decade_txt_x1000", "m_txt_degraded")
    rec("text", s"$work/decade_txt_x1000_cmp", "m_txt_regrained")
    rec("vec", s"$work/decade_vec_x1000", "m_vec_degraded")
    rec("vec", s"$work/decade_vec_x1000_cmp", "m_vec_regrained")
    spark.stop()
  }
}
