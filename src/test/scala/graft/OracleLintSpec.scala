package graft

import org.scalatest.funsuite.AnyFunSuite

/** Oracle-SQL lint: no bare integer `sum()` may feed a FINAL output
  * column. DuckDB's integer sum() returns HUGEINT, which the driver's
  * harness materializes as float64 while Spark emits int64 — the
  * value-identical results then hash-differently and the determinism
  * gate goes red. This exact bug class cost round 1 (q54) and round 3
  * (q78) their only red rows; the convention is `CAST(sum(...) AS
  * BIGINT)` (or AS DOUBLE for monetary sums) in every final
  * projection. Interior CTE sums are fine — only what reaches the
  * output schema is hashed.
  */
class OracleLintSpec extends SparkSpec {

  /** items of the top-level (depth-0) final SELECT's projection list,
    * split on top-level commas. */
  private def finalProjection(sql: String): Seq[String] = {
    val s = sql
    val up = s.toUpperCase
    // positions of SELECT / FROM at paren depth 0
    var depth = 0
    var lastSelect = -1
    var i = 0
    val fromAfter = collection.mutable.ArrayBuffer.empty[(Int, Int)]
    while (i < s.length) {
      s.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ =>
          if (depth == 0 && up.startsWith("SELECT", i) &&
            (i == 0 || !Character.isLetterOrDigit(s.charAt(i - 1))))
            lastSelect = i
          if (depth == 0 && up.startsWith("FROM", i) &&
            (i == 0 || !Character.isLetterOrDigit(s.charAt(i - 1))))
            fromAfter += ((i, depth))
      }
      i += 1
    }
    assert(lastSelect >= 0, "no top-level SELECT found")
    val end = fromAfter.map(_._1).find(_ > lastSelect)
      .getOrElse(s.length)
    val proj = s.substring(lastSelect + "SELECT".length, end)
    // split on top-level commas
    val items = collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    depth = 0
    proj.foreach {
      case '(' => depth += 1; cur += '('
      case ')' => depth -= 1; cur += ')'
      case ',' if depth == 0 => items += cur.toString; cur.clear()
      case c => cur += c
    }
    if (cur.nonEmpty) items += cur.toString
    items.map(_.trim).filter(_.nonEmpty).toSeq
  }

  /** aliases bound to an UNCAST sum anywhere in the SQL ("sum(...) AS
    * x" with no CAST( immediately wrapping) — the q78 bug flowed one
    * of these (`tot`) into the final projection unconverted. */
  private def uncastSumAliases(sql: String): Set[String] = {
    val up = sql.toUpperCase
    val out = collection.mutable.Set.empty[String]
    var i = up.indexOf("SUM")
    while (i >= 0) {
      val isWord = (i == 0 || !Character.isLetterOrDigit(up.charAt(i - 1)))
      val open = sql.indexWhere(!_.isWhitespace, i + 3)
      if (isWord && open >= 0 && sql.charAt(open) == '(') {
        // balanced close paren
        var depth = 0; var j = open
        while (j < sql.length && (depth != 0 || j == open)) {
          if (sql.charAt(j) == '(') depth += 1
          else if (sql.charAt(j) == ')') depth -= 1
          j += 1
        }
        // wrapped in CAST( ... directly before?
        val before = sql.substring(0, i).reverse.dropWhile(_.isWhitespace)
        val wrapped = before.startsWith("(") &&
          before.drop(1).dropWhile(_.isWhitespace)
            .toUpperCase.startsWith("TSAC")
        "(?i)^\\s+AS\\s+(\\w+)".r.findFirstMatchIn(sql.substring(j))
          .foreach(m => if (!wrapped) out += m.group(1).toLowerCase)
      }
      i = up.indexOf("SUM", i + 3)
    }
    out.toSet
  }

  test("every final-projection sum() in every oracle is CAST-wrapped") {
    val offenders = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap {
      case (name, sql) =>
        val hugeAliases = uncastSumAliases(sql)
        finalProjection(sql).filter { item =>
          val up = item.toUpperCase
          val direct = "(?i)\\bSUM\\s*\\(".r.findFirstMatchIn(up).exists {
            m => up.lastIndexOf("CAST", m.start) < 0
          }
          // alias form: flag only a BARE pass-through of an uncast-sum
          // alias (`tot` / `t.tot` / `tot AS n_tokens`) — that is the
          // exact q78/q54 shape. An alias inside arithmetic (q65's
          // `s1 / nd / 1e4`) changes type on the way out and is fine.
          val viaAlias = hugeAliases.exists { a =>
            ("(?i)^(\\w+\\.)?" + a + "(\\s+AS\\s+\\w+)?$").r
              .findFirstIn(item.trim).isDefined
          }
          direct || viaAlias
        }.map(item => s"$name: $item")
    }
    assert(offenders.isEmpty,
      "uncast sum() reaching a final projection (HUGEINT→float64 hash " +
        "bug class; wrap in CAST(... AS BIGINT/DOUBLE)):\n" +
        offenders.mkString("\n"))
  }

  test("no catalog query emits a scale-0 DECIMAL output column") {
    // Round-9's only two red rows (q233 est_out, q239 sum_prod/cov_num)
    // were DECIMAL(38,0) FINAL columns: value-equal on both engines but
    // hash-divergent, because the driver's parquet→pandas channel
    // renders scale-0 decimal as float64 ("2401.0", lossy past 2^53)
    // while DuckDB renders HUGEINT-integer. Interior decimal math is
    // fine — only the OUTPUT schema is hashed, so the lint walks every
    // query's analyzed schema at sf0.001. NOTE: constructing the
    // DataFrames is NOT free of execution — queries that read a 1-row
    // bound eagerly run a small job, the q258/q259/q260 rows drive
    // their fixpoint loops to convergence at sf0.001, and the
    // side-table-backed rows (q36/q144/q44/q84 family) build their
    // parquet side tables under GRAFT_SIDE_DIR on a cold machine.
    // Cheap at sf0.001 (seconds), but this test does execute jobs and
    // write side-table files, not just analyze plans.
    import org.apache.spark.sql.types.DecimalType
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        fn(spark, sf()).schema.fields.collect {
          case f if f.dataType.isInstanceOf[DecimalType] &&
            f.dataType.asInstanceOf[DecimalType].scale == 0 =>
            s"$name.${f.name}: ${f.dataType.sql}"
        }
    }
    assert(offenders.isEmpty,
      "scale-0 DECIMAL reaching an output schema (pandas-float64 vs " +
        "DuckDB-integer hash bug class; emit BIGINT with an overflow " +
        "contract instead):\n" + offenders.mkString("\n"))
  }

  test("catalog integrity: unique well-formed names; every oracle has a query") {
    val names = SparkEntry.catalog.map(_.name)
    // a duplicate name silently drops one entry from the `queries`
    // map while the catalog Seq still lists both — the driver's gate
    // would pass with coverage quietly shrunk
    val dups = names.groupBy(identity).filter(_._2.length > 1).keys
    assert(dups.isEmpty, s"duplicate catalog names: ${dups.mkString(", ")}")
    names.foreach(n => assert(n.matches("^q\\d+_[a-z0-9_]+$"),
      s"malformed query name: $n"))
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle SQL without a query: $orphans")
  }
}
