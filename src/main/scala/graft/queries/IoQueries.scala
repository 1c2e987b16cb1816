package graft.queries

import org.apache.spark.sql.functions._
import graft.io.Tables

/** Gate-visible sink coverage: each query WRITES through an engine sink
  * into a scratch dir, reads its own output back, and returns a result
  * the DuckDB oracle recomputes from the source table — so the zstd
  * parquet sink (reference S7, parquet_assembler.py:34-37), hive-layout
  * partitioning, and the row-range split knob (reference S3,
  * parquet_slicer.py:53-58) are all verified end to end, not just
  * spec-asserted.
  *
  * Scratch dirs are unique per JVM (createTempDirectory at class init):
  * two concurrent gate/verify runs — or two users on one host — never
  * write into each other's output mid-read. Within one JVM the same dir
  * is reused across repeated executions (mode=overwrite), which is what
  * the bench's min-of-3 timing wants.
  */
object IoQueries {

  private lazy val scratchRoot: java.nio.file.Path =
    java.nio.file.Files.createTempDirectory("graft_io_")

  private def scratch(name: String): String =
    scratchRoot.resolve(name).toString

  val qs: Seq[Q] = Seq(

    // ---- zstd partitioned sink + partition-pruned read ------------------
    //      the write partitions by lang; the read-back filter must then
    //      touch only the lang=en directory (PartitionFilters in the
    //      scan — asserted structurally in PartitionPruningSpec; here the
    //      oracle verifies the VALUES survive the sink round-trip)
    Q("io01_partitioned_roundtrip",
      (s, d) => {
        val out = scratch("io01")
        Tables.writePartitioned(Tables.documents(s, d), out, "lang")
        s.read.parquet(out)
          .filter(col("lang") === "en")
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("sum_chars"),
            countDistinct(col("doc_id")).as("n_distinct"))
      },
      Some("""
        SELECT lang, COUNT(*) AS n_docs,
          CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
          COUNT(DISTINCT doc_id) AS n_distinct
        FROM documents WHERE lang = 'en' GROUP BY lang""")),

    // ---- row-range splitting on write (reference S3 parity) -------------
    //      one writer task + maxRecordsPerFile=200 chunks the table into
    //      ceil(n/200) files of bounded size — Spark's form of the
    //      slicer's fixed-row chunks; the oracle recomputes the expected
    //      chunk count from the row count
    Q("io02_row_range_split",
      (s, d) => {
        val out = scratch("io02")
        Tables.documents(s, d).repartition(1)
          .write.mode("overwrite")
          .option("compression", "zstd")
          .option("maxRecordsPerFile", 200L)
          .parquet(out)
        s.read.parquet(out)
          // project the file name first: nondeterministic expressions are
          // legal in a Project but not inside aggregate arguments
          .select(input_file_name().as("f"))
          .agg(countDistinct(col("f")).as("n_files"),
            count(lit(1)).as("n_rows"))
      },
      Some("""
        SELECT CAST(CEIL(COUNT(*) / 200.0) AS BIGINT) AS n_files,
          COUNT(*) AS n_rows
        FROM documents""")),

    // ---- small-file compaction ------------------------------------------
    //      the daily chore of a 100 TB lake: a fragmented landing dir
    //      (here: 50-row files) rewritten to a bounded file count with no
    //      row lost. repartition(2) pins the output file count exactly;
    //      at scale the partition count comes from bytes/targetFileSize.
    Q("io03_compaction",
      (s, d) => {
        val frag = scratch("io03_frag")
        val compact = scratch("io03_compact")
        Tables.documents(s, d).repartition(1)
          .write.mode("overwrite").option("maxRecordsPerFile", 50L)
          .parquet(frag)
        s.read.parquet(frag).repartition(2)
          .write.mode("overwrite").option("compression", "zstd")
          .parquet(compact)
        val before = s.read.parquet(frag)
          .select(input_file_name().as("f"))
          .agg(countDistinct(col("f")).as("n_files_before"))
        s.read.parquet(compact)
          .select(input_file_name().as("f"), col("doc_id"))
          .agg(countDistinct(col("f")).as("n_files_after"),
            count(lit(1)).as("n_rows"),
            countDistinct(col("doc_id")).as("n_distinct"))
          .crossJoin(before)
          .select(col("n_files_before"), col("n_files_after"),
            col("n_rows"), col("n_distinct"))
      },
      Some("""
        SELECT CAST(CEIL(COUNT(*) / 50.0) AS BIGINT) AS n_files_before,
          CAST(2 AS BIGINT) AS n_files_after,
          COUNT(*) AS n_rows,
          COUNT(DISTINCT doc_id) AS n_distinct
        FROM documents"""))
  )
}
