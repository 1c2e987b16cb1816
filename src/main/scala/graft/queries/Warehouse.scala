package graft.queries

import org.apache.spark.sql.functions._
import graft.io.Tables

/** Warehouse-maintenance operators: slowly-changing-dimension (SCD2)
  * history merge. Plain-parquet engines get MERGE semantics as one
  * outer join + a conditional row expansion — the shape a table-format
  * MERGE executes underneath: one shuffle on the key, row-local
  * expansion, no driver involvement.
  *
  * The "update feed" is synthesized deterministically from the base
  * table (every 7th customer gets a new balance effective 1997-01-01)
  * so the oracle can rebuild the identical merge.
  */
object Warehouse {

  val qs: Seq[Q] = Seq(

    // ---- SCD2 merge: base snapshot + update feed -> versioned history ---
    //      unchanged keys keep their open row; updated keys get the old
    //      row closed at the effective date plus a new open row
    Q("w01_scd2_merge",
      (s, d) => {
        val eff = lit("1997-01-01").cast("timestamp")
        val origin = lit("1995-01-01").cast("timestamp")
        val base = Tables.customer(s, d)
          .select(col("c_custkey"), col("c_acctbal"), col("c_mktsegment"))
        val updates = base.filter(col("c_custkey") % 7 === 0)
          .select(col("c_custkey"), (col("c_acctbal") + 100.0).as("new_bal"))
        base.join(updates, Seq("c_custkey"), "left_outer")
          .select(col("c_custkey"), col("c_mktsegment"), explode(
            when(col("new_bal").isNull,
              array(struct(col("c_acctbal").as("acctbal"),
                origin.as("valid_from"),
                lit(null).cast("timestamp").as("valid_to"))))
            .otherwise(array(
              struct(col("c_acctbal").as("acctbal"),
                origin.as("valid_from"), eff.as("valid_to")),
              struct(col("new_bal").as("acctbal"),
                eff.as("valid_from"),
                lit(null).cast("timestamp").as("valid_to")))))
            .as("v"))
          .select(col("c_custkey"), col("c_mktsegment"),
            col("v.acctbal").as("acctbal"),
            col("v.valid_from").as("valid_from"),
            col("v.valid_to").as("valid_to"))
      },
      Some("""
        SELECT c_custkey, c_mktsegment, c_acctbal AS acctbal,
          TIMESTAMP '1995-01-01' AS valid_from,
          CASE WHEN c_custkey % 7 = 0 THEN TIMESTAMP '1997-01-01' END
            AS valid_to
        FROM customer
        UNION ALL
        SELECT c_custkey, c_mktsegment, c_acctbal + 100.0 AS acctbal,
          TIMESTAMP '1997-01-01' AS valid_from,
          CAST(NULL AS TIMESTAMP) AS valid_to
        FROM customer WHERE c_custkey % 7 = 0"""))
  )
}
