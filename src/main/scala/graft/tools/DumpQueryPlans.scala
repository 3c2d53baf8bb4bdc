package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
import graft.{SparkEntry, Tables}

/** Writes one `<out>/<query>_<suffix>.txt` per named query containing
  * its `.explain("formatted")` output — the per-round optimization
  * evidence format (`plans/rNN/<query>_{before,after}.txt`).
  *
  * Args: `-sf <dir>` (default /root/testdata/sf0.1), `-out <dir>`,
  * `-suffix <before|after>` (default after), then query names.
  * Session shape matches [[DumpPlans]] (local[8], 8 shuffle
  * partitions) so the two artifacts stay comparable. */
object DumpQueryPlans {
  def main(args: Array[String]): Unit = {
    def flag(name: String): Option[String] =
      args.indexOf(name) match {
        case -1 => None
        case i => args.lift(i + 1)
      }
    val sfDir = flag("-sf").getOrElse("/root/testdata/sf0.1")
    val outDir = flag("-out").getOrElse(sys.props("user.dir") + "/plans/tmp")
    val suffix = flag("-suffix").getOrElse("after")
    val flagVals =
      Seq(flag("-sf"), flag("-out"), flag("-suffix")).flatten.toSet
    val names = args.filterNot(_.startsWith("-")).filterNot(flagVals)
    require(names.nonEmpty, "no query names given")

    val spark = Tables.configure(SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      require(SparkEntry.queries.contains(name), s"unknown query $name")
      val df = SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        ExplainMode.fromString("formatted"))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"),
        txt.getBytes("UTF-8"))
      System.err.println(s"[plans] wrote $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
