package graft

import org.apache.spark.sql.SparkSession

/** Scaling-efficiency evidence for the north rule: the same pipeline job on
  * the same input at two parallelism levels (local[8] vs local[32] —
  * the sandbox stand-in for N vs 4N executors; BASELINE.md).
  * Prints one JSON line with throughput at both levels and
  * eff = (tps32 / tps8) / 4.
  */
object ScalingBench {

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-scaling-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = {
    val nConvs = args.headOption.map(_.toLong).getOrElse(290000L) // ~1M turns
    val lo = args.lift(1).map(_.toInt).getOrElse(8)
    val hi = args.lift(2).map(_.toInt).getOrElse(32)

    def run(cores: Int): (Double, Long) = {
      val spark = session(cores)
      try {
        Bench.pipelineRun(spark, 2000L)  // warmup: codegen + classloading
        val (s1, n1) = Bench.pipelineRun(spark, nConvs)
        val (s2, _) = Bench.pipelineRun(spark, nConvs)
        (math.min(s1, s2), n1)           // best-of-2, warm
      } finally spark.stop()
    }

    val (secLo, turns) = run(lo)
    val (secHi, _) = run(hi)
    val tpsLo = turns / secLo
    val tpsHi = turns / secHi
    val eff = (tpsHi / tpsLo) / (hi.toDouble / lo)
    println(f"""{"metric":"scaling_efficiency","value":$eff%.3f,"unit":"ratio","turns":$turns,"cores_lo":$lo,"cores_hi":$hi,"sec_lo":$secLo%.2f,"sec_hi":$secHi%.2f,"tps_lo":$tpsLo%.0f,"tps_hi":$tpsHi%.0f}""")
  }
}
