package graft.tools

/** Repeats one registry query N times in a single JVM and prints every
  * rep's wall — the adjudication tool for "is this wall regression
  * real, or is it measurement context?" (round-16 use: d17/c01/c02
  * reproduced 1.3-1.75x over baseline in an isolated quiet-host Bench
  * run on code IDENTICAL to the baseline build, so the remaining
  * variable is JVM/JIT warmup depth: Bench gives a query 1 tiny-SF
  * warmup + 3 interleaved reps, while in the full-suite baseline run
  * d17 executes after the whole c-/d-family has JIT-compiled the
  * shared vector/clustering codepaths hot).
  *
  * If the rep series converges to the baseline number after a few
  * reps, the "regression" is warmup context and the baseline row is
  * the steady-state truth; if it stays flat above baseline, the
  * regression is real at any warmth and the baseline row is the
  * outlier.
  *
  * Usage: `runMain graft.tools.RepeatProbe <query> [reps] [sfDir]`
  */
object RepeatProbe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(
      sys.error("usage: RepeatProbe <query> [reps] [sfDir]"))
    val reps = args.lift(1).map(_.toInt).getOrElse(8)
    val dir = args.lift(2).getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.getOrCreate("repeat-probe")
    val entry = graft.queries.Registry.all.find(_.name == name)
      .getOrElse(sys.error(s"unknown query: $name"))
    // setup re-runs UNTIMED before EVERY rep (not once): Bench clears
    // the cache after each rep, so a setup-cached query's reported min
    // comes from the pass-0 rep where setup just rebuilt the cache —
    // re-running setup here puts every probe rep in that same
    // warm-cache context; setup-once would make reps 2+ pay the cache
    // rebuild inside the timed wall and converge to a number that is
    // not Bench-comparable (advice r16)
    val setup = graft.queries.Registry.setups.get(name)
    for (i <- 1 to reps) {
      setup.foreach(_(spark, dir))
      val t0 = System.nanoTime()
      entry.run(spark, dir).write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      println(f"[repeat] $name rep $i%2d: $sec%.3f s")
    }
    spark.stop()
  }
}
