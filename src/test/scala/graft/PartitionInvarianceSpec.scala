package graft

/** Partition-count invariance — the property the decimal-exactness
  * discipline buys: results must be BIT-identical no matter how the
  * cluster splits the work (4-way vs 32-way shuffles re-order every
  * partial aggregation). Any query whose doubles came from raw float
  * summation would fail this on re-deployment; the registered surface
  * must not.
  */
class PartitionInvarianceSpec extends SparkSpec {

  private val probes = Seq(
    "q01_agg",              // decimal money sums
    "h01_pricing_summary",  // decimal sums + charge chain
    "c01_kmeans_step",      // decimal coordinate means
    "q50_correlation",      // rational corr from decimal moments
    "t03_quality",          // double ratios (row-local, no aggregation)
    "s01_cosine_topk")      // left-fold vector math + window cut

  test("results are bit-identical across shuffle partition counts") {
    val qs = SparkEntry.queries
    for (name <- probes) {
      def resultAt(parts: String): Seq[Seq[Any]] = {
        val s2 = spark.newSession()
        s2.conf.set("spark.sql.shuffle.partitions", parts)
        qs(name)(s2, sfTiny).collect().toSeq.map(_.toSeq)
          .sortBy(_.mkString("|"))
      }
      val four = resultAt("4")
      val thirtyTwo = resultAt("32")
      assert(four == thirtyTwo,
        s"$name diverged between 4 and 32 shuffle partitions")
    }
  }
}
