package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.sources.GraftSink

/** Model-based law testing for the sink's transactional surface:
  * random operation sequences (append / overwrite / compact / vacuum /
  * SQL delete) run against BOTH the real table and a trivial in-memory
  * model, and after every step the table must equal the model — plus
  * the global invariants (metadata COUNT == model size with zero
  * readers; every surviving version time-travels to its recorded model
  * state; a tail drained over an append+compaction history delivers
  * the full append multiset exactly once). The hand-written specs pin
  * each feature alone; this pins their COMPOSITION, where
  * transactional formats actually break.
  */
class GraftSinkModelSpec extends SparkSpec {
  import spark.implicits._

  private case class Op(kind: Int, rows: List[(Long, String)], arg: Long)

  private val opGen: Gen[Op] = for {
    kind <- Gen.frequency(5 -> 0, 2 -> 1, 2 -> 2, 1 -> 3, 2 -> 4)
    n <- Gen.choose(1, 4)
    rows <- Gen.listOfN(n, for {
      k <- Gen.choose(0L, 40L)
      s <- Gen.alphaLowerStr.map(_.take(4))
    } yield (k, s))
    arg <- Gen.choose(0L, 40L)
  } yield Op(kind, rows, arg)

  private def sequence(seed: Long, len: Int): List[Op] =
    Gen.listOfN(len, opGen)
      .pureApply(Gen.Parameters.default, Seed(seed))

  test("random append/overwrite/compact/vacuum/delete sequences: the " +
    "table tracks the model at every step, with live invariants") {
    for (trial <- 1 to 6) {
      val dir = tmpDir(s"sink_model") + "/t"
      // model: multiset of rows; history: version -> model state at
      // that version; appended: every row ever APPENDED (change feed)
      var model = Vector.empty[(Long, String)]
      val history = collection.mutable.Map.empty[Int, Vector[(Long, String)]]

      def table: Seq[(Long, String)] =
        spark.read.format("graftsink").load(dir)
          .as[(Long, String)].collect().toSeq

      sequence(seed = 100L + trial, len = 10).foreach { op =>
        op.kind match {
          case 0 => // append
            op.rows.toDF("k", "s").write.format("graftsink")
              .mode("append").save(dir)
            model = model ++ op.rows
          case 1 => // overwrite
            op.rows.toDF("k", "s").write.format("graftsink")
              .mode("overwrite").save(dir)
            model = op.rows.toVector
          case 2 => // compact (no-op before first write)
            if (GraftSink.latestVersion(spark, dir).isDefined)
              GraftSink.compact(spark, dir)
          case 3 => // vacuum keep 3 (no-op before first write)
            if (GraftSink.latestVersion(spark, dir).isDefined) {
              val expired = GraftSink.vacuum(spark, dir, keepVersions = 3)
                .expiredVersions
              expired.foreach(history.remove)
            }
          case 4 => // copy-on-write delete through the table API
            if (GraftSink.latestVersion(spark, dir).isDefined) {
              // copy-on-write delete: survivors overwrite (the same
              // publish path the SQL DELETE takes)
              spark.read.format("graftsink").load(dir)
                .filter(col("k") =!= op.arg)
                .write.format("graftsink").mode("overwrite").save(dir)
              model = model.filterNot(_._1 == op.arg)
            }
        }
        if (GraftSink.latestVersion(spark, dir).isDefined) {
          history(GraftSink.latestVersion(spark, dir).get) = model
          // 1. the table equals the model (multiset)
          assert(table.sorted == model.sorted,
            s"trial $trial after op ${op.kind}: table != model")
          // 2. metadata COUNT: exact, zero data-file readers
          val before = GraftSink.readersCreated.get()
          assert(spark.read.format("graftsink").load(dir).count()
            == model.size.toLong)
          assert(GraftSink.readersCreated.get() == before,
            s"trial $trial: COUNT opened data files")
        }
      }
      // 3. every surviving recorded version time-travels to its state
      history.foreach { case (v, state) =>
        val got = spark.read.format("graftsink").option("version", v)
          .load(dir).as[(Long, String)].collect().toSeq
        assert(got.sorted == state.sorted,
          s"trial $trial: version $v lost its snapshot")
      }
    }
  }

  test("the streaming tail, drained after a random batch history, " +
    "delivers every appended row exactly once (no compaction replay)") {
    for (trial <- 1 to 3) {
      val dir = tmpDir("sink_model_tail") + "/t"
      // append-only history with interleaved compactions
      var expected = Vector.empty[(Long, String)]
      sequence(seed = 900L + trial, len = 8).foreach { op =>
        if (op.kind == 2 && GraftSink.latestVersion(spark, dir).isDefined)
          GraftSink.compact(spark, dir)
        else {
          op.rows.toDF("k", "s").write.format("graftsink")
            .mode("append").save(dir)
          expected = expected ++ op.rows
        }
      }
      if (expected.nonEmpty) {
        val name = s"model_tail_$trial"
        val q = spark.readStream.format("graftsink")
          .option("startingVersion", 0).load(dir)
          .writeStream.format("memory").queryName(name).start()
        try {
          q.processAllAvailable()
          val got = spark.table(name).as[(Long, String)].collect().toSeq
          assert(got.sorted == expected.sorted,
            s"trial $trial: tail != append history " +
              s"(${got.size} vs ${expected.size} rows)")
        } finally q.stop()
      }
    }
  }
}
