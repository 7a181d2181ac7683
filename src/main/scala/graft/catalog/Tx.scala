package graft.catalog

/** Shared deterministic text/hash expression builders, emitted twice: once as
  * Spark SQL (expr strings over whole-stage-codegen'd higher-order functions)
  * and once as DuckDB SQL for the oracle. Both sides fold serially in the
  * same order, so even double-typed results are bitwise identical.
  *
  * The polynomial hash is h = fold(chars, 0, (a, c) => (a*31 + c) mod p),
  * p = 2147483647 (2^31-1): values stay < 2^31 so any affine step
  * (a*h + b) with a,b < 2^31 fits in a signed 64-bit BIGINT on both engines.
  */
object Tx {
  final val P = 2147483647L

  /** normalized token array: lowercase, strip non [a-z ], split on space runs. */
  val wsExpr = "split(trim(regexp_replace(lower(text), '[^a-z ]', '')), ' +')"
  val wsSql =
    "regexp_split_to_array(trim(regexp_replace(lower(text), '[^a-z ]', '', 'g')), ' +')"

  /** serial polynomial hash of string expression `s`, Spark side. */
  def polyHash(s: String): String =
    s"aggregate(transform(sequence(1, length($s)), i -> ascii(substring($s, i, 1))), " +
      s"cast(0 as bigint), (a, x) -> (a*31 + x) % $P)"

  /** serial left-fold dot product, DuckDB side (Spark side: VectorExprs.dot
    * / TextKernels.dotd — identical IEEE op order). */
  def dotSql(va: String, vb: String): String =
    s"list_reduce(list_prepend(0::DOUBLE, list_transform(range(1, len($va)+1), i -> $va[i] * $vb[i])), " +
      s"(a, x) -> a + x)"

  /** same hash, DuckDB side (list_reduce has no init → prepend the zero). */
  def polyHashSql(s: String): String =
    s"list_reduce(list_prepend(0::BIGINT, list_transform(range(1, length($s)+1), i -> unicode($s[i]))), " +
      s"(a, x) -> (a*31 + x) % $P)"

  /** distinct word n-gram shingles of the token array `ws`, Spark side.
    * Guarded: size(ws) <= n-1 → empty array (Spark `sequence(1, 0)` would
    * otherwise generate a DESCENDING sequence and fabricate shingles). */
  def shinglesExpr(n: Int, ws: String = "ws"): String = {
    val words = (0 until n).map(k => s"element_at($ws, p + $k)").mkString(", ")
    s"if(size($ws) < $n, array(), " +
      s"array_distinct(transform(sequence(1, size($ws) - ${n - 1}), p -> concat_ws(' ', $words))))"
  }

  /** same shingles, DuckDB side (range(1, k) is empty for k <= 1). */
  def shinglesSql(n: Int, ws: String = "ws"): String = {
    val words = (0 until n).map(k => s"$ws[p + $k]").mkString(" || ' ' || ")
    s"list_distinct(list_transform(range(1, greatest(len($ws) - ${n - 1}, 0) + 1), p -> $words))"
  }

  /** ALL (non-distinct) n-gram shingles — occurrence counts matter where
    * shingles become tf WEIGHTS (d16), unlike the set-semantics
    * shinglesExpr. Same empty-guard. */
  def shinglesAllExpr(n: Int, ws: String = "ws"): String = {
    val words = (0 until n).map(k => s"element_at($ws, p + $k)").mkString(", ")
    s"if(size($ws) < $n, array(), " +
      s"transform(sequence(1, size($ws) - ${n - 1}), p -> concat_ws(' ', $words)))"
  }

  /** same non-distinct shingles, DuckDB side. */
  def shinglesAllSql(n: Int, ws: String = "ws"): String = {
    val words = (0 until n).map(k => s"$ws[p + $k]").mkString(" || ' ' || ")
    s"list_transform(range(1, greatest(len($ws) - ${n - 1}, 0) + 1), p -> $words)"
  }
}
