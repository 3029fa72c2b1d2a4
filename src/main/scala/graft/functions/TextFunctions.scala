package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared text-pipeline column builders (dedup / text-analysis suites).
  *
  * Everything here is built-in Catalyst expressions (codegen'd, no UDFs) and
  * has an exact DuckDB mirror, noted per function — the dedup oracles depend
  * on both engines computing identical strings/hashes. Seeded md5 is the
  * cross-engine hash primitive: both engines produce identical hex, and hex
  * strings order identically, so `min(md5(...))` is a portable MinHash.
  */
object TextFunctions {

  /** Canonical text normalization: lowercase, trim, collapse whitespace.
    * DuckDB mirror: `lower(trim(regexp_replace(text, '\s+', ' ', 'g')))`
    * (Spark's regexp_replace is global by default; DuckDB needs 'g'). */
  def normText(text: Column): Column =
    lower(trim(regexp_replace(text, "\\s+", " ")))

  /** Whitespace tokens of normalized text. Mirror: `string_split(t, ' ')`. */
  def words(norm: Column): Column = split(norm, " ")

  /** Word k-shingles joined by spaces, WITH duplicates — downstream
    * consumers are min-folds (duplicate-insensitive), so nothing dedups
    * the exploded rows; a duplicate-SENSITIVE consumer must add its own
    * `distinct` (as `ngramJaccard` does).
    *
    * Formulated as zip_with over k shifted slices rather than
    * `transform(sequence(...), j -> slice(ws, j, k))`: an expression
    * referenced INSIDE a HOF lambda is re-evaluated per element, so the
    * naive form recomputes the whole regexp_replace+split chain once per
    * shingle — quadratic per document (measured 12s for 5000 docs; this
    * form is linear). Mirror: `list_transform(range(1, len(ws) - k + 2),
    *   j -> array_to_string(ws[j:j+k-1], ' '))`. */
  def shingles(ws: Column, k: Int): Column = {
    val len = greatest(size(ws) - (k - 1), lit(0))
    val parts = (1 to k).map(i => slice(ws, lit(i), len))
    parts.reduce((acc, p) => zip_with(acc, p, (a, b) => concat(a, lit(" "), b)))
  }

  /** 64 hex chars of digest material per shingle — two seeded md5s, the
    * source for all 8 MinHash slices. Two digests instead of eight is the
    * md5-cost sweet spot: one digest's 32 hex chars would cap slices at
    * 16 bits, and the min of n draws from a 2¹⁶ space collapses toward 0
    * once n approaches 65k distinct shingles (book-length docs) — every
    * such doc would band-collide with every other. 32-bit slices keep the
    * collision floor at ~n·2⁻³² (≈10⁻⁴ at a million shingles).
    * Mirror: `md5(s) || md5('1|' || s)`. */
  def minhashHex(shingle: Column): Column =
    concat(md5(shingle), md5(concat(lit("1|"), shingle)))

  /** The i-th MinHash over the pre-computed `minhashHex` column
    * (aggregate): hash i is hex chars [8i, 8i+8) — eight independent
    * 32-bit slices of two digests instead of eight seeded digests (md5
    * was the dominant cost of the signature pass; this cuts it 4×).
    * Fixed-width lowercase hex orders lexicographically == numerically in
    * both engines, and the oracle replays the identical scheme.
    * Mirror: `min(substr(hexcat, ${8*i+1}, 8))`. */
  def minhash(i: Int, hexcat: Column): Column = {
    require(0 <= i && i < 8, s"two md5 digests yield 8 slices of 8 hex chars; got i=$i")
    min(substring(hexcat, 8 * i + 1, 8))
  }

  /** Bit `j` (0-based, 0..15) of the first 16 bits of md5(`wordSql`), as a
    * SQL fragment valid in BOTH Spark SQL and DuckDB:
    * nibble = instr('0123456789abcdef', substr(md5(w), floor(j/4)+1, 1)) - 1;
    * bit    = floor(nibble / 2^(3 - j%4)) % 2.
    * NOTE: every double→int conversion goes through floor() first — DuckDB
    * CAST(double AS INT) *rounds* while Spark truncates. */
  /** Deterministic signed feature weight in [-2048, 2047]: the integer
    * value of the first THREE hex nibbles of md5(`wordSql`) minus 2048,
    * as a SQL fragment valid in BOTH Spark SQL and DuckDB (the
    * `md5BitSql` instr-nibble idiom — no hex→int cast exists portably).
    * This is the "hashing trick" weight table of a fastText-style linear
    * model: the weight lives in the hash itself, so scoring needs no
    * side table at all. */
  def md5WeightSql(wordSql: String): String =
    s"""CAST((instr('0123456789abcdef', substr(md5($wordSql), 1, 1)) - 1) * 256
       | + (instr('0123456789abcdef', substr(md5($wordSql), 2, 1)) - 1) * 16
       | + (instr('0123456789abcdef', substr(md5($wordSql), 3, 1)) - 1)
       | - 2048 AS BIGINT)""".stripMargin

  /** Deterministic feature bucket in [0, 4095]: the integer value of the
    * first THREE hex nibbles of md5(`wordSql`) — [[md5WeightSql]] without
    * the recentering — as a SQL fragment valid in BOTH Spark SQL and
    * DuckDB. This is the fixed hashed-feature space of the DSIR
    * importance estimator (Spark side mirrors it as
    * `conv(substring(md5(t),1,3),16,10)`). */
  def md5BucketSql(wordSql: String): String =
    s"""CAST((instr('0123456789abcdef', substr(md5($wordSql), 1, 1)) - 1) * 256
       | + (instr('0123456789abcdef', substr(md5($wordSql), 2, 1)) - 1) * 16
       | + (instr('0123456789abcdef', substr(md5($wordSql), 3, 1)) - 1)
       | AS BIGINT)""".stripMargin

  def md5BitSql(wordSql: String, jSql: String): String =
    s"""CAST(floor(
       |  (instr('0123456789abcdef', substr(md5($wordSql), CAST(floor(($jSql) / 4) AS INT) + 1, 1)) - 1)
       |  / pow(2, 3 - (($jSql) % 4))) AS INT) % 2""".stripMargin
}
