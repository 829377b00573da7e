package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    // optional 3rd arg: comma-separated query-name filter (local
    // iteration aid; the driver always runs the full set)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.queries.Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
      }
    def q(s: String): String = Json.quote(s)
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Quantified health for the no-oracle queries: sketch error vs the
    // exact twin, LSH/IVF recall vs brute force — numbers instead of
    // `no_oracle` in the round's artifacts. Reads the parquet dumped
    // above, never recomputing the (quadratic) exact twins.
    try {
      val all = ToleranceCheck.run(spark, outDir, sfDir)
      val checks = all.map { case (name, c) =>
        s"${q(name)}: {${q("metric")}: ${q(c.metric)}, " +
          s"${q("value")}: ${c.value}, ${q("bound")}: ${c.bound}, " +
          s"${q("pass")}: ${c.pass}, ${q("note")}: ${q(c.note)}}"
      }.mkString("{", ",", "}")
      Files.writeString(Paths.get(s"$outDir/tolerance_check.json"), checks)
      // The same artifact, committed IN the repo beside the driver's
      // CORRECTNESS_r{n}.json (round = max existing + 1), so the 22
      // no-oracle rows are auditable from the repo alone instead of a
      // /tmp scratch dir. Best-effort: skipped when cwd isn't the
      // repo, and skipped for FILTERED runs (a local single-query
      // iteration must not replace the round's full-artifact copy
      // with a mostly-missing-inputs one).
      try {
        val here = Paths.get(".").toAbsolutePath
        if (only.isEmpty && Files.exists(here.resolve("build.sbt"))) {
          val pat = "CORRECTNESS_r(\\d+)\\.json".r
          val round = Files.list(here).toArray.map(_.toString)
            .flatMap(p => pat.findFirstMatchIn(p).map(_.group(1).toInt))
            .maxOption.getOrElse(0) + 1
          Files.writeString(
            here.resolve(f"TOLERANCE_r$round%02d.json"), checks)
        }
      } catch { case e: Throwable =>
        System.err.println(s"[verify] tolerance repo copy failed: ${e.getMessage}")
      }
      // One sidecar per no-oracle query, beside its result dir: a
      // `no_oracle` row in the driver's correctness table is never
      // opaque — the quantified bound sits right next to the parquet
      // it describes.
      all.foreach { case (name, c) =>
        val side = s"{${q("query")}: ${q(name)}, " +
          s"${q("metric")}: ${q(c.metric)}, ${q("value")}: ${c.value}, " +
          s"${q("bound")}: ${c.bound}, ${q("pass")}: ${c.pass}, " +
          s"${q("note")}: ${q(c.note)}}"
        Files.writeString(Paths.get(s"$outDir/$name.tolerance.json"), side)
      }
    } catch { case e: Throwable =>
      System.err.println(s"[verify] tolerance_check failed: ${e.getMessage}")
    }
    spark.stop()
  }
}
