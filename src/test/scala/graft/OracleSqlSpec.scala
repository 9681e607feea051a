package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins for the OracleSql.materialize transform (round-16 verdict #1).
  * The transform is textual, so its two blind spots are contracts the
  * oracle corpus must keep: named-window definitions must stay
  * single (a second `, w2 AS (` in a WINDOW list would be corrupted
  * into a CTE-materialize), and statements relying on correlated
  * subqueries must carry the EXISTS keyword that opts them out
  * (DuckDB 1.0 mis-evaluates correlated subqueries over materialized
  * CTEs — the q368/q385 zero-row class). */
class OracleSqlSpec extends AnyFunSuite {

  private lazy val raw: Map[String, String] = SparkEntry.oracleSql

  test("materialize is idempotent on every shipped oracle") {
    for ((n, sql) <- raw)
      assert(OracleSql.materialize(sql) == sql,
        s"$n: transform not a fixpoint on the shipped oracle")
  }

  test("no WINDOW clause is corrupted and none defines a second window") {
    for ((n, sql) <- raw) {
      var idx = sql.indexOf("WINDOW ")
      while (idx >= 0) {
        val after = sql.substring(idx + 7)
        assert(after.matches("(?s)\\s*\\w+ AS \\(.*"),
          s"$n: WINDOW clause shape unexpected (corrupted?) at $idx")
        // paren-walk the window spec; the next token must NOT start a
        // second `, name AS (` definition the transform would hit
        val open = after.indexOf('(')
        var depth = 1; var i = open + 1
        while (depth > 0 && i < after.length) {
          if (after(i) == '(') depth += 1
          else if (after(i) == ')') depth -= 1
          i += 1
        }
        val tail = after.substring(i).dropWhile(_.isWhitespace)
        assert(!tail.matches("(?s),\\s*\\w+ AS \\(.*"),
          s"$n: multi-window WINDOW list — materialize would corrupt " +
            "the second definition; split into separate WINDOW clauses")
        idx = sql.indexOf("WINDOW ", idx + 7)
      }
    }
  }

  test("EXISTS statements stay fully inlined") {
    // (the complement — everything else materialized — is exactly the
    // idempotence test above: the CTE pattern matches nothing after)
    for ((n, sql) <- raw if sql.contains("EXISTS"))
      assert(!sql.contains("AS MATERIALIZED"),
        s"$n: EXISTS statement must stay fully inlined (correlated " +
          "subqueries over materialized CTEs mis-evaluate)")
  }
}
