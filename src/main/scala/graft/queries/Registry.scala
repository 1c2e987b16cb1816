package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared engine query: a Spark DataFrame program plus, where the
  * semantics are ANSI-SQL-expressible, an equivalent DuckDB oracle query
  * (driver correctness gate — see /root/repo/src/main/scala/graft/Verify.scala).
  *
  * Oracle discipline (SURVEY.md §7.5): aggregates of doubles go through
  * exact DECIMAL arithmetic on BOTH sides so the final double cast is
  * bit-identical regardless of summation order; no timezone-dependent or
  * double→string rendering in compared columns; every computed column is
  * aliased identically in Spark and SQL.
  */
final case class Q(
  name: String,
  run: (SparkSession, String) => DataFrame,
  oracle: Option[String] = None,
  /** One-time input staging (e.g. st09's 8-file source split, io04's
    * bucketed table writes) that `run` depends on but that is a
    * pipeline-setup cost, not the query's steady-state cost. The driver
    * contract stays self-contained — [[Registry.queries]] composes
    * setup before run — while Bench runs setup UNTIMED once per query
    * so the reported number is the repeated-execution cost (the
    * round-7 verdict: st09/io04 were billing their source writes to
    * every timed rep). Must be idempotent (mode=overwrite). */
  setup: Option[(SparkSession, String) => Unit] = None)

object Registry {
  def all: Seq[Q] =
    Relational.qs ++ Relational2.qs ++ TripParity.qs ++ TextOps.qs ++
      Dedup.qs ++ Similarity.qs ++ Events.qs ++ Multimodal.qs ++
      StreamingQueries.qs ++ TpcH.qs ++ Sketches.qs ++ IoQueries.qs ++
      Clustering.qs ++ Warehouse.qs ++ Graph.qs

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> ((s: SparkSession, d: String) => {
      q.setup.foreach(_(s, d)); q.run(s, d)
    })).toMap

  /** setup-only view for harnesses that time `run` separately (Bench) */
  def setups: Map[String, (SparkSession, String) => Unit] =
    all.flatMap(q => q.setup.map(q.name -> _)).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
