package graft.checks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.expr.Fnv64

/** Cross-run row invariants — the per-row identity contract.
  *
  * The reference's invariant is the content-addressed record hash: any
  * mutation changes identity and is detected on re-hash (reference:
  * src/sssom_pydantic/database/repo.py:204-218 `_mutate` re-hashes, and
  * api.py:883-936 `hash_mapping`). Ours (BASELINE.json::input_hint) is
  * byte-identical extracted `text` per `url`: a digest column stored per
  * run and re-verified against the previous run.
  *
  * Scale design: digests are computed scan-side (codegen'd FNV-64 /
  * built-in hash expressions, no UDF); the comparison is an equi-join on
  * the key — sort-merge at scale, with only (key, 8-byte digest) columns
  * shuffled, never the text itself.
  */
object Invariants {

  /** Reference-faithful digest: FNV-1a 64 over UTF-8 bytes, uppercase hex
    * of little-endian bytes (api.py:926-936).
    */
  def textDigest(c: Column): Column = Fnv64.fnv64Hex(c)

  /** Rows whose digest of `valueCol` differs between two runs, keyed by
    * `keyCols`. Emits key columns + both digests.
    */
  def digestChanged(current: DataFrame, baseline: DataFrame,
                    keyCols: Seq[String], digest: Column): DataFrame = {
    val cur = current.select(keyCols.map(col) :+ digest.as("digest_current"): _*)
    val base = baseline.select(keyCols.map(col) :+ digest.as("digest_baseline"): _*)
    cur.join(base, keyCols, "inner")
      .filter(col("digest_current") =!= col("digest_baseline"))
  }
}
