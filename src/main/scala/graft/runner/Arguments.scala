package graft.runner

/** Per-invocation run options — the reference's CLI argument surface
  * (`data_integration/arguments.py:1-41`) re-expressed for the Spark
  * runner:
  *
  *  - `--select job...`       sync only the named jobs (reference:
  *                            `nargs="*"`; intersects with the control
  *                            table's active flag, it never overrides
  *                            an inactive job)
  *  - `--full-refresh`        force a full reload of the target from
  *                            the source, ignoring any stored watermark
  *  - `--incremental-value v` use `v` as the watermark instead of the
  *                            target's MAX — the reference's
  *                            "load last year/month for developing"
  *                            override
  */
final case class RunOptions(
    select: Option[Set[String]] = None,
    fullRefresh: Boolean = false,
    incrementalValue: Option[String] = None) {
  def isDefault: Boolean = this == RunOptions()
}

object RunOptions {
  /** Strict parse: an unknown `--flag` is an error (silently ignoring a
    * typo'd `--ful-refresh` would run the wrong load strategy); bare
    * tokens following `--select` accumulate as job names.
    */
  def parse(args: Seq[String]): RunOptions = {
    def loop(rest: List[String], acc: RunOptions): RunOptions = rest match {
      case Nil => acc
      case "--full-refresh" :: tail =>
        loop(tail, acc.copy(fullRefresh = true))
      case "--incremental-value" :: v :: tail if !v.startsWith("--") =>
        loop(tail, acc.copy(incrementalValue = Some(v)))
      case "--incremental-value" :: _ =>
        sys.error("--incremental-value requires a value")
      case "--select" :: tail =>
        val (names, after) = tail.span(!_.startsWith("--"))
        if (names.isEmpty) sys.error("--select requires at least one job name")
        loop(after, acc.copy(select = Some(
          acc.select.getOrElse(Set.empty) ++ names)))
      case other :: _ =>
        sys.error(s"unknown argument: $other " +
          "(expected --select, --full-refresh, --incremental-value)")
    }
    loop(args.toList, RunOptions())
  }
}
