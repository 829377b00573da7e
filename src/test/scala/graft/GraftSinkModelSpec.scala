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
          // 2b. segment-layer invariants under composition: the
          // manifest-list's ref counts + inline tail account for
          // exactly the resolved entry list, every ref resolves, and
          // the list stays log-bounded after ANY op mix (the strict
          // geometric ladder is restored at each roll; replaces may
          // shrink a middle rung in between, never add rungs)
          val m = GraftSink.latestManifest(spark, dir).get
          assert(m.fileCount == m.files.size,
            s"trial $trial: ref counts disagree with resolved entries")
          assert(m.inline.size <= 32,
            s"trial $trial: inline tail ${m.inline.size} over threshold")
          assert(m.refs.size <= 10,
            s"trial $trial: segment list grew to ${m.refs.size}")
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

  test("random histories with column renames and tags: evolution is " +
    "zero-rewrite, history reads old names, tags survive vacuum") {
    val eOpGen: Gen[(Int, List[(Long, String)], Long)] = for {
      kind <- Gen.frequency(5 -> 0, 2 -> 1, 2 -> 2, 2 -> 3, 2 -> 4,
        2 -> 5)
      n <- Gen.choose(1, 4)
      rows <- Gen.listOfN(n, for {
        k <- Gen.choose(0L, 40L)
        s <- Gen.alphaLowerStr.map(_.take(4))
      } yield (k, s))
      arg <- Gen.choose(0L, 40L)
    } yield (kind, rows, arg)
    val names = Vector("s", "s2") // the rename toggle
    for (trial <- 1 to 4) {
      val dir = tmpDir("sink_model_evo") + "/t"
      var model = Vector.empty[(Long, String)]
      var cur = 0 // index into names
      // version -> (rows, value-column name at that version)
      val history =
        collection.mutable.Map.empty[Int, (Vector[(Long, String)], Int)]
      var tagged = Map.empty[String, Int]
      def started = GraftSink.latestVersion(spark, dir).isDefined
      def read(v: Option[Int] = None): (Seq[(Long, String)], Seq[String]) = {
        val base = spark.read.format("graftsink")
        val df = v.fold(base)(x => base.option("version", x)).load(dir)
        (df.toDF("k", "v").as[(Long, String)].collect().toSeq,
          df.columns.toSeq)
      }
      Gen.listOfN(14, eOpGen)
        .pureApply(Gen.Parameters.default, Seed(8600L + trial))
        .foreach { case (kind, rows, arg) =>
          kind match {
            case 0 =>
              rows.toDF("k", names(cur)).write.format("graftsink")
                .mode("append").save(dir)
              model = model ++ rows
            case 1 => if (started) { // rename toggle: zero-rewrite
              GraftSink.renameColumn(spark, dir, names(cur),
                names(1 - cur))
              cur = 1 - cur
            }
            case 2 => if (started) GraftSink.compact(spark, dir)
            case 3 => if (started) {
              val expired = GraftSink.vacuum(spark, dir,
                keepVersions = 2).expiredVersions
              expired.foreach(history.remove)
              // every tag's pinned version must have SURVIVED
              tagged.foreach { case (n, v) =>
                assert(GraftSink.manifestAt(spark, dir, Some(v))
                  .isDefined, s"trial $trial: tagged v$v vacuumed away")
              }
            }
            case 4 => if (started) {
              val (rows0, _) = read()
              rows0.filterNot(_._1 == arg)
                .toDF("k", names(cur)).write.format("graftsink")
                .mode("overwrite").save(dir)
              model = model.filterNot(_._1 == arg)
            }
            case 5 => if (started) { // tag the head once per version
              val v = GraftSink.latestVersion(spark, dir).get
              if (!tagged.values.exists(_ == v)) {
                GraftSink.tag(spark, dir, s"t$v")
                tagged += (s"t$v" -> v)
              }
            }
          }
          if (started) {
            history(GraftSink.latestVersion(spark, dir).get) =
              (model, cur)
            val (rows1, cols) = read()
            assert(cols === Seq("k", names(cur)),
              s"trial $trial: live schema must carry the current name")
            assert(rows1.sorted == model.sorted,
              s"trial $trial after op $kind: table != model")
          }
        }
      // every surviving recorded version time-travels to its rows AND
      // its name-at-that-version (pinned manifests keep old DDLs)
      history.foreach { case (v, (state, nameIdx)) =>
        val (rows2, cols) = read(Some(v))
        assert(cols === Seq("k", names(nameIdx)),
          s"trial $trial: v$v must read under its own column name")
        assert(rows2.sorted == state.sorted,
          s"trial $trial: version $v lost its snapshot")
      }
      // tags resolve by NAME to their recorded state
      tagged.foreach { case (n, v) =>
        history.get(v).foreach { case (state, _) =>
          val got = spark.read.format("graftsink").option("version", n)
            .load(dir).toDF("k", "v").as[(Long, String)]
            .collect().toSeq
          assert(got.sorted == state.sorted,
            s"trial $trial: tag $n diverged from v$v")
        }
      }
    }
  }

  test("random histories with NaN-bearing doubles: file skipping, " +
    "bound merging, and metadata MIN/MAX stay exact at every step") {
    val nanGen: Gen[Double] = Gen.frequency(
      4 -> Gen.choose(-50.0, 50.0).map(v => math.rint(v * 4) / 4),
      1 -> Gen.const(Double.NaN))
    val dOpGen: Gen[(Int, List[(Long, Double)], Long)] = for {
      kind <- Gen.frequency(5 -> 0, 1 -> 1, 2 -> 2, 2 -> 3, 2 -> 4)
      n <- Gen.choose(1, 4)
      rows <- Gen.listOfN(n, for {
        k <- Gen.choose(0L, 40L); v <- nanGen
      } yield (k, v))
      arg <- Gen.choose(0L, 40L)
    } yield (kind, rows, arg)
    for (trial <- 1 to 4) {
      val dir = tmpDir("sink_model_nan") + "/t"
      var model = Vector.empty[(Long, Double)]
      def started = GraftSink.latestVersion(spark, dir).isDefined
      // NaN-safe multiset compare: doubles compared AS their
      // (canonicalized) bit patterns — tuple == on NaN is never true
      def canon(xs: Seq[(Long, Double)]) =
        xs.map(r => (r._1, java.lang.Double.doubleToLongBits(r._2)))
          .sorted
      Gen.listOfN(12, dOpGen)
        .pureApply(Gen.Parameters.default, Seed(4200L + trial))
        .foreach { case (kind, rows, arg) =>
          kind match {
            case 0 =>
              rows.toDF("k", "v").write.format("graftsink")
                .mode("append").save(dir)
              model = model ++ rows
            case 1 =>
              rows.toDF("k", "v").write.format("graftsink")
                .mode("overwrite").save(dir)
              model = rows.toVector
            case 2 => if (started) GraftSink.compact(spark, dir)
            case 3 => if (started) GraftSink.cluster(spark, dir, Seq("v"))
            case 4 => if (started) {
              spark.read.format("graftsink").load(dir)
                .filter(col("k") =!= arg)
                .write.format("graftsink").mode("overwrite").save(dir)
              model = model.filterNot(_._1 == arg)
            }
          }
          if (started) {
            val t = spark.read.format("graftsink").load(dir)
            assert(canon(t.as[(Long, Double)].collect().toSeq)
              == canon(model), s"trial $trial op $kind: table != model")
            // range probe rides file skipping; Spark orders NaN above
            // every double, so NaN rows qualify for `v > c`
            val thr = (arg - 20).toDouble
            val gtGot = t.filter(col("v") > thr)
              .as[(Long, Double)].collect().toSeq
            val gtWant = model.filter(r => r._2.isNaN || r._2 > thr)
            assert(canon(gtGot) == canon(gtWant),
              s"trial $trial: `v > $thr` skipped a live row " +
                s"(${gtGot.size} vs ${gtWant.size})")
            // equality probe: NaN never equals a finite literal
            val eqGot = t.filter(col("v") === thr)
              .as[(Long, Double)].collect().toSeq
            assert(canon(eqGot) == canon(model.filter(_._2 == thr)))
            // metadata MIN/MAX (bounds possibly merged by compaction
            // and re-tracked by clustering): min = finite minimum
            // unless every value is NaN; max = NaN iff any NaN
            if (model.nonEmpty) {
              val (mn, mx) = t.agg(min(col("v")), max(col("v")))
                .as[(Double, Double)].head()
              val finite = model.map(_._2).filterNot(_.isNaN)
              val wantMn =
                if (finite.isEmpty) Double.NaN else finite.min
              val wantMx =
                if (finite.size < model.size) Double.NaN else finite.max
              def same(a: Double, b: Double) =
                (a.isNaN && b.isNaN) || a == b
              assert(same(mn, wantMn) && same(mx, wantMx),
                s"trial $trial: metadata MIN/MAX ($mn,$mx) != " +
                  s"($wantMn,$wantMx)")
            }
          }
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
