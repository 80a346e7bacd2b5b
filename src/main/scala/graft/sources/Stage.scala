package graft.sources

import org.apache.spark.sql.DataFrame

/** Materialize-through-parquet — the q101/q102 decision-table discipline
  * as a reusable operator: write the frame once, read it back, and every
  * downstream consumer starts from a parquet scan instead of re-running
  * the producing plan. This is how a multi-consumer intermediate (a
  * verified pair list feeding CC + counts + an anti-join) avoids both the
  * N× recompute of a lazy frame AND the lingering persisted-RDD state of
  * `cache`/`localCheckpoint` — at cluster scale the staged table is what
  * a production pipeline materializes anyway.
  *
  * Each call writes a fresh [[Scratch]] dir (tmpfs when available, reaped
  * by the harness after the query — staged decision tables are KB–MB
  * sized scaffolding whose durability is never the contract).
  */
object Stage {

  /** Write `df` to a fresh staging path and return the read-back frame. */
  def through(df: DataFrame): DataFrame = {
    val p = Scratch.dir("graft_stage") + "/t"
    df.write.mode("overwrite").parquet(p)
    df.sparkSession.read.parquet(p)
  }
}
