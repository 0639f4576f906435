package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared ×N replication transforms for the two scale-fixture
  * generators (`graft.ScaleStress`, `graft.SfGen`). Both scaladocs
  * argue "the ideal workload at factor N is exactly N× the base" —
  * that argument only holds if the stress corpus and the sf1 corpus
  * replicate with the SAME semantics, so the transforms live here
  * once instead of as drift-prone copies.
  */
object Replica {

  /** Replica r's document text: every token suffixed `_r{r}` for
    * r > 0, identity for the base replica. Within-replica similarity
    * structure is the base corpus's; cross-replica token overlap is
    * zero, so dedup/LSH candidate work scales exactly ×N. */
  def suffixTokens(text: Column, r: Int): Column =
    if (r == 0) text
    else array_join(transform(split(text, " "),
      t => concat(t, lit(s"_r$r"))), " ")

  /** documents replica body: suffixed text with `n_chars` recomputed
    * for r > 0. The suffixes lengthen every token and the base corpus
    * guarantees n_chars == length(text) (0 violations at sf0.1);
    * copying the base value through would make char-derived quality
    * scores (chars_per_token, ratio gates) systematically different
    * across replicas — a data artifact in selectivity that the
    * N×-workload claim forbids. */
  def docText(df: DataFrame, r: Int): DataFrame =
    if (r == 0) assertCharsInvariant(df)
    else df.withColumn("text", suffixTokens(col("text"), r))
      .withColumn("n_chars", length(col("text")).cast("bigint"))

  /** The base replica passes through un-recomputed, which is only
    * sound while n_chars == length(text) holds corpus-wide. Assert it
    * per row (codegen'd raise_error, no extra pass) so a future
    * testdata generation that breaks the invariant fails loudly here
    * instead of silently skewing replica-0 char-derived selectivity
    * vs replicas 1..N (ADVICE r8). */
  private def assertCharsInvariant(df: DataFrame): DataFrame =
    df.withColumn("n_chars",
      when(col("n_chars") === length(col("text")).cast("bigint"), col("n_chars"))
        .otherwise(raise_error(concat(
          lit("Replica.docText: base corpus violates n_chars == length(text) at doc_id="),
          col("doc_id").cast("string")))))
}
