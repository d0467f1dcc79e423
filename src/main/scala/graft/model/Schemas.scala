package graft.model

import java.sql.Timestamp

/** Engine-wide case-class schemas (SURVEY.md §1). All Spark I/O goes through
  * `.as[T]` on these so schema drift fails at analysis time. Field names are
  * snake_case to match the on-disk parquet column names exactly.
  */

/** One transcript turn — the north-rule input shape (BASELINE.json input_hint):
  * (conv_id, turn_idx, role, text, tool, ts).
  */
final case class Turn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: String,
    ts: Timestamp)

/** Dense stable docID: 0-based rank under lexicographic (conv_id, turn_idx). */
final case class DocIdEntry(doc_id: Long, conv_id: String, turn_idx: Int)

/** A turn with its assigned dense docID (stage S1 output). */
final case class NumberedTurn(
    doc_id: Long,
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: String,
    ts: Timestamp)

/** A corpus document after docID assignment: what indexing consumes. */
final case class Doc(doc_id: Long, text: String)

/** Flat term-frequency row: one per (doc, distinct term). `dl` = analyzed
  * token count of the doc (repeated per term so SPIMI can compute exact
  * per-block max tfNorm without a join).
  */
final case class TermFreqRow(doc_id: Long, term: String, tf: Int, dl: Int)

/** Per-term corpus statistics: df = docs containing term, cf = total
  * occurrences.
  */
final case class TermStat(term: String, df: Long, cf: Long)

/** Whole-corpus statistics (tiny; collected to the driver, broadcast). */
final case class CorpusStats(n_docs: Long, total_tokens: Long, avgdl: Double)

/** Dictionary row written alongside the index: global per-term metadata
  * including the global block-max bound (idf-unmultiplied, see Blocks).
  */
final case class DictEntry(term: String, df: Long, cf: Long, max_tf_norm: Double)

/** Per-partition lineage manifest row — written alongside index segments;
  * drives resume (SURVEY.md §2 row 21).
  */
final case class ManifestEntry(
    stage: String,
    partition_id: Int,
    input_fingerprint: String,
    rows: Long,
    bytes: Long,
    wall_ms: Long,
    status: String,
    ts: Timestamp)

/** Build/query metric row. */
final case class MetricRow(run_id: String, stage: String, key: String, value: Double, ts: Timestamp)

/** A scored search hit. */
final case class Hit(doc_id: Long, score: Double)
