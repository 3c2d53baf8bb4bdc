package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Word-shingle construction shared by the dedup family.
  *
  * Both the Spark side and the DuckDB oracle SQL must tokenize
  * identically, so the contract is pinned here:
  *   words    = regex-split of trim(lower(text)) on \s+
  *   shingles = distinct 3-word grams joined with a single space
  */
object TextShingles {

  /** `array<string>` of whitespace tokens of trim(lower(text)). */
  def words(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** Distinct 3-word shingles; empty array when fewer than 3 words.
    * Native expression ([[WordShingles]]) — the composed
    * transform/concat_ws/array_distinct chain runs interpreted and
    * dominated every dedup query at sf0.1. */
  def shingles3(wordsCol: Column): Column =
    WordShinglesExpr.wordShingles(wordsCol, 3)

  /** Exact Jaccard of two distinct-element string arrays, as a DOUBLE
    * built from exact integer set sizes (identical across engines). */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b))
    inter / (size(a) + size(b) - inter)
  }

  /** DuckDB fragment producing the same doc_id→shingle-set relation
    * (the oracle side of the contract above). */
  val duckdbShingleCte: String =
    """WITH sh AS (
         SELECT doc_id,
                list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                               for i in range(1, len(w)-1)]) AS s
         FROM (SELECT doc_id,
                      string_split_regex(trim(lower(text)), '\s+') AS w
               FROM documents))"""

  /** DuckDB all-pairs verified-similarity oracle at threshold `tau`. */
  def duckdbAllPairsOracle(tau: Double): String =
    s"""$duckdbShingleCte
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                     / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 4) AS j4
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
              / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= $tau
        ORDER BY id_a, id_b"""
}
